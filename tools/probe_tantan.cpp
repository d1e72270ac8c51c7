#include "SubstitutionMatrix.h"
#include "tantan.h"
#include <cstdio>
#include <fstream>
#include <vector>
#include <string>

int main(int argc, char** argv) {
    std::ifstream in(argv[1]);
    std::vector<std::string> names, rows;
    std::string line, cur, name;
    while (std::getline(in, line)) {
        if (!line.empty() && line[0] == '>') {
            if (!cur.empty()) { rows.push_back(cur); cur.clear(); }
            names.push_back(line.substr(1, line.find(' ') - 1));
        } else cur += line;
    }
    if (!cur.empty()) rows.push_back(cur);
    SubstitutionMatrix subMat("VTML80.out", 8.0f, -0.2f);
    ProbabilityMatrix probMatrix(subMat);
    const int xIndex = subMat.aa2num[(int)'X'];
    for (size_t k = 0; k < rows.size(); k++) {
        std::vector<char> ords(rows[k].size());
        for (size_t i = 0; i < rows[k].size(); i++)
            ords[i] = (char)subMat.aa2num[(int)rows[k][i]];
        std::vector<char> orig = ords;
        tantan::maskSequences(ords.data(), ords.data() + ords.size(), 50,
            probMatrix.probMatrixPointers,
            0.005, 0.05, 0.5, 0, 0, 0.9, probMatrix.hardMaskTable);
        printf("%s ", names[k].c_str());
        for (size_t i = 0; i < ords.size(); i++)
            putchar(ords[i] != orig[i] || ords[i] == xIndex ? '1' : '0');
        printf("\n");
    }
    return 0;
}

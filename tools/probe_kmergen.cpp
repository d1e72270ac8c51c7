#include "SubstitutionMatrix.h"
#include "ExtendedSubstitutionMatrix.h"
#include "FixedKmerGenerator.h"
#include "Indexer.h"
#include <cstdio>
#include <fstream>
#include <vector>
#include <string>
#include <algorithm>

int main(int argc, char** argv) {
    // args: fasta kmerThr maxKmersPerPos
    int kmerThr = atoi(argv[2]);
    int maxKmers = atoi(argv[3]);
    const int K = 9;
    std::ifstream in(argv[1]);
    std::vector<std::string> rows;
    std::string line, cur;
    while (std::getline(in, line)) {
        if (!line.empty() && line[0] == '>') {
            if (!cur.empty()) { rows.push_back(cur); cur.clear(); }
        } else cur += line;
    }
    if (!cur.empty()) rows.push_back(cur);

    SubstitutionMatrix subMat("VTML80.out", 8.0f, -0.2f);
    ScoreMatrix two = ExtendedSubstitutionMatrix::calcScoreMatrix(subMat, 2);
    ScoreMatrix three = ExtendedSubstitutionMatrix::calcScoreMatrix(subMat, 3);
    FixedKmerGenerator gen(K, subMat.alphabetSize - 1, kmerThr, maxKmers);
    gen.setDivideStrategy(&three, &two);
    Indexer idx(subMat.alphabetSize - 1, K);

    // sample windows: every 97th position across all sequences
    int printed = 0;
    for (size_t s = 0; s < rows.size(); s++) {
        std::vector<unsigned char> ords(rows[s].size());
        for (size_t i = 0; i < rows[s].size(); i++)
            ords[i] = subMat.aa2num[(int)rows[s][i]];
        for (size_t p = 0; p + K <= ords.size(); p += 97) {
            bool hasX = false;
            for (int j = 0; j < K; j++)
                if (ords[p + j] >= 20) hasX = true;
            if (hasX) continue;
            std::pair<size_t*, size_t> res = gen.generateKmerList(&ords[p]);
            // print window + decoded candidates, sorted
            std::vector<std::string> cands;
            for (size_t c = 0; c < res.second; c++) {
                size_t code = res.first[c];
                // decode big-endian base-20
                char buf[K + 1];
                size_t rem = code;
                for (int j = 0; j < K; j++) { buf[j] = subMat.num2aa[rem % 20]; rem /= 20; }
                buf[K] = 0;
                cands.push_back(buf);
            }
            std::sort(cands.begin(), cands.end());
            cands.erase(std::unique(cands.begin(), cands.end()), cands.end());
            printf("%zu:%zu", s, p);
            for (auto &c : cands) printf(" %s", c.c_str());
            printf("\n");
            printed++;
        }
    }
    fprintf(stderr, "windows: %d\n", printed);
    return 0;
}

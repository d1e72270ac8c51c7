#include "SubstitutionMatrix.h"
#include <cstdio>
int main() {
    SubstitutionMatrix m("VTML80.out", 8.0f, -0.2f);
    printf("alphabet: ");
    for (int a = 0; a < m.alphabetSize; a++) putchar(m.num2aa[a]);
    printf("\n");
    for (int a = 0; a < 20; a++) {
        for (int b = 0; b < 20; b++) printf("%d ", m.subMatrix[a][b]);
        printf("\n");
    }
    return 0;
}

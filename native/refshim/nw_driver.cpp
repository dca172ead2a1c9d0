/* Differential-test driver for the reference SeqAn global alignment path
 * (ObservationModelSeqAn::align + convertAlignment + flank computation).
 *
 * stdin lines:  refSeq candidateSeq
 * stdout lines: score | hpos... | pos:var:lfh:rfh:lfr:rfr ... | pos:snp ... | align firstBase lastBase relPos
 */
#include <iostream>
#include <sstream>
#include <string>
#include <cstring>
#include "ObservationModelSeqAn.hpp"
#include "Haplotype.hpp"
#include "Read.hpp"

using namespace std;

int main() {
    string ref, cand;
    cout.precision(17);
    while (cin >> ref >> cand) {
        Haplotype hRef;
        hRef.append(ref);

        Read rh1;
        bam1_t *bam = (bam1_t *)calloc(1, sizeof(bam1_t));
        rh1.bam = bam;
        rh1.initBam = true;
        rh1.pos = 0;
        rh1.posStat.first = 0;
        rh1.mapQual = 1.0 - 1e-32;
        rh1.seq.seq = cand;
        rh1.setAllQual(1.0 - 1e-16);

        ObservationModelParameters alignParams("probabilistic");
        alignParams.pError = 0.0001;
        alignParams.pMut = 0.01;
        alignParams.maxLengthDel = 50;
        alignParams.forceReadOnHaplotype = true;
        alignParams.bMid = 0;

        seqan::Score<int> score(-1, -460, -100, -960);
        ObservationModelSeqAn om(hRef, rh1, 0, alignParams, score);
        om.align();
        const MLAlignment &ml = om.getMLAlignment();

        cout << ml.ll << " |";
        for (size_t i = 0; i < ml.hpos.size(); i++) cout << " " << ml.hpos[i];
        cout << " |";
        for (map<int, AlignedVariant>::const_iterator it = ml.indels.begin(); it != ml.indels.end(); it++)
            cout << " " << it->first << ":" << it->second.getString()
                 << ":" << it->second.getLeftFlankHap() << ":" << it->second.getRightFlankHap()
                 << ":" << it->second.getLeftFlankRead() << ":" << it->second.getRightFlankRead();
        cout << " |";
        for (map<int, AlignedVariant>::const_iterator it = ml.snps.begin(); it != ml.snps.end(); it++)
            cout << " " << it->first << ":" << it->second.getString();
        cout << " | " << ml.align << " " << ml.firstBase << " " << ml.lastBase << " " << ml.relPos << endl;
    }
    return 0;
}

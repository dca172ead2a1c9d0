/* Differential-test driver for the reference pair-HMM.
 *
 * Reads cases from stdin, one per line:
 *   hapSeq readSeq mapQual posStatFirst hapStart pError pMut maxLengthDel
 *   pFirstgLO bMid forceOnHap unmapped qual0,qual1,...
 * and prints for each:
 *   ll offHap offHapHMQ llOff llOn | mapStates | pos:var,... | pos:var,...
 *
 * Links against the unmodified reference ObservationModelFB.cpp with stub
 * bam/boost headers; used only to produce golden values for tests.
 */
#include <iostream>
#include <sstream>
#include <string>
#include <vector>
#include <cstring>
#include "ObservationModelFB.hpp"
#include "Haplotype.hpp"
#include "Read.hpp"

using namespace std;

int main() {
    string line;
    cout.precision(17);
    while (getline(cin, line)) {
        if (line.empty()) continue;
        istringstream is(line);
        string hapSeq, readSeq, quals;
        double mapQual, posStatFirst, pError, pMut, pFirstgLO;
        int hapStart, maxLengthDel, bMid, forceOnHap, unmapped;
        is >> hapSeq >> readSeq >> mapQual >> posStatFirst >> hapStart
           >> pError >> pMut >> maxLengthDel >> pFirstgLO >> bMid
           >> forceOnHap >> unmapped >> quals;

        Haplotype hap;
        hap.seq = hapSeq;

        Read read;
        bam1_t *bam = (bam1_t *)calloc(1, sizeof(bam1_t));
        bam->core.flag = unmapped ? BAM_FUNMAP : 0;
        read.bam = bam;
        read.initBam = true;  // so Read copies made inside the model stay valid
        read.seq.seq = readSeq;
        read.mapQual = mapQual;
        read.pos = 0;
        read.posStat.first = posStatFirst;
        read.qual.clear();
        {
            stringstream qs(quals);
            string tok;
            while (getline(qs, tok, ',')) read.qual.push_back(atof(tok.c_str()));
        }

        ObservationModelParameters params;
        params.pError = pError;
        params.pMut = pMut;
        params.maxLengthDel = maxLengthDel;
        params.maxLengthIndel = maxLengthDel;
        params.pFirstgLO = pFirstgLO;
        params.bMid = bMid;
        params.forceReadOnHaplotype = forceOnHap != 0;

        ObservationModelFBMaxErr om(hap, read, (uint32_t)hapStart, params);
        MLAlignment ml = om.calcLikelihood();
        vector<int> ms = om.getMapState();

        cout << ml.ll << " " << (int)ml.offHap << " " << (int)ml.offHapHMQ
             << " " << ml.llOff << " " << ml.llOn << " " << ml.firstBase
             << " " << ml.lastBase << " |";
        for (size_t i = 0; i < ms.size(); i++) cout << " " << ms[i];
        cout << " |";
        for (map<int, AlignedVariant>::const_iterator it = ml.indels.begin(); it != ml.indels.end(); it++)
            cout << " " << it->first << ":" << it->second.getString();
        cout << " |";
        for (map<int, AlignedVariant>::const_iterator it = ml.snps.begin(); it != ml.snps.end(); it++)
            cout << " " << it->first << ":" << it->second.getString();
        cout << endl;
    }
    return 0;
}

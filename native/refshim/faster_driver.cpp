/* Differential-test driver for the reference sparse ("--faster") pair-HMM.
 *
 * Reads cases from stdin, one per line:
 *   hapSeq readSeq mapQual posStatFirst hapStart pError pMut
 *   maxLengthIndel capMapQualFast qual0,qual1,...
 * and prints for each:
 *   ll offHap offHapHMQ firstBase lastBase | hpos... | pos:var,... | pos:var,...
 *
 * Links against the unmodified reference Faster.cpp (ObservationModelS)
 * with stub bam/boost headers; used only to produce golden values for
 * tests/test_faster.py.
 */
#include <iostream>
#include <sstream>
#include <string>
#include <vector>
#include <cstring>
#include <cstdlib>
#include "Faster.hpp"
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
        double mapQual, posStatFirst, pError, pMut, capMapQualFast;
        int hapStart, maxLengthIndel;
        is >> hapSeq >> readSeq >> mapQual >> posStatFirst >> hapStart
           >> pError >> pMut >> maxLengthIndel >> capMapQualFast >> quals;

        Haplotype hap;
        hap.seq = hapSeq;

        Read read;
        bam1_t *bam = (bam1_t *)calloc(1, sizeof(bam1_t));
        read.bam = bam;
        read.initBam = true;
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
        params.maxLengthIndel = maxLengthIndel;
        params.maxLengthDel = maxLengthIndel;
        params.capMapQualFast = capMapQualFast;

        HapHash hash(4, hap);
        ObservationModelS om(hap, read, (uint32_t)hapStart, params);
        MLAlignment ml = om.align(hash);

        cout << ml.ll << " " << (int)ml.offHap << " " << (int)ml.offHapHMQ
             << " " << ml.firstBase << " " << ml.lastBase << " |";
        for (size_t i = 0; i < ml.hpos.size(); i++) cout << " " << ml.hpos[i];
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

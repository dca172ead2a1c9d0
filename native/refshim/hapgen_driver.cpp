/* Differential-test driver for the reference haplotype generation:
 * HaplotypeDistribution (block algebra over read CIGARs) + HDIterator2
 * (maxHap pruning + candidate-variant injection), compiled from the
 * unmodified reference HaplotypeDistribution.cpp / HapBlock.cpp with stub
 * bam/boost headers.  Used only to produce golden values for
 * tests/test_hapgen_ref.py.
 *
 * stdin protocol (line oriented, one or more cases):
 *   CASE midPos refSeqStart leftPos rightPos maxHap noIndelWindow changeINStoN refSeq
 *   READ pos flag mapq cigar seq        (0+ lines)
 *   VAR pos addComb varString           (0+ lines; varString e.g. +AC, -TT, A=>G)
 *   RUN
 * output per case:
 *   OK start end logNumHaps
 *   HAP seq freq                        (in generateHapsWithAlignedVariants order)
 *   ... or, on a thrown string:
 *   ERR message
 * then always:
 *   ENDCASE
 */
#include <iostream>
#include <sstream>
#include <string>
#include <vector>
#include <cstring>
#include <cstdlib>
#include <cctype>
#include "HaplotypeDistribution.hpp"
#include "VariantFile.hpp"

using namespace std;

static int nt2nib(char c) {
    switch (c) {
        case 'A': return 1; case 'C': return 2;
        case 'G': return 4; case 'T': return 8;
        default: return 15;
    }
}

static bam1_t *make_bam(int pos, int flag, int mapq, const string &cigarStr,
                        const string &seq) {
    vector<uint32_t> cig;
    size_t i = 0;
    while (i < cigarStr.size()) {
        int len = 0;
        while (i < cigarStr.size() && isdigit(cigarStr[i])) {
            len = len * 10 + (cigarStr[i] - '0');
            i++;
        }
        int op;
        switch (cigarStr[i++]) {
            case 'M': op = BAM_CMATCH; break;
            case 'I': op = BAM_CINS; break;
            case 'D': op = BAM_CDEL; break;
            case 'S': op = BAM_CSOFT_CLIP; break;
            case 'H': op = BAM_CHARD_CLIP; break;
            case 'N': op = BAM_CREF_SKIP; break;
            default: cerr << "bad cigar " << cigarStr << endl; abort();
        }
        cig.push_back(((uint32_t)len << BAM_CIGAR_SHIFT) | op);
    }
    bam1_t *b = bam_init1();
    b->core.pos = pos;
    b->core.flag = flag;
    b->core.qual = mapq;
    b->core.n_cigar = cig.size();
    b->core.l_qname = 2;
    b->core.l_qseq = (int32_t)seq.size();
    int dl = 2 + 4 * (int)cig.size() + ((int)seq.size() + 1) / 2
             + (int)seq.size();
    b->data = (uint8_t *)calloc(dl, 1);
    b->data_len = dl;
    b->data[0] = 'r';
    if (!cig.empty())
        memcpy(bam1_cigar(b), &cig[0], 4 * cig.size());
    uint8_t *s = bam1_seq(b);
    for (size_t x = 0; x < seq.size(); x++)
        s[x >> 1] |= nt2nib(seq[x]) << 4 * (1 - (x & 1));
    uint8_t *q = bam1_qual(b);
    for (size_t x = 0; x < seq.size(); x++) q[x] = 30;
    return b;
}

int main() {
    cout.precision(17);
    string line;
    uint32_t midPos = 0, refSeqStart = 0, leftPos = 0, rightPos = 0;
    size_t maxHap = 8;
    int noIndelWindow = -1, changeN = 0;
    string refSeq;
    vector<bam1_t *> bams;
    AlignedCandidates cands;
    while (getline(cin, line)) {
        if (line.empty()) continue;
        istringstream is(line);
        string tok;
        is >> tok;
        if (tok == "CASE") {
            is >> midPos >> refSeqStart >> leftPos >> rightPos >> maxHap
               >> noIndelWindow >> changeN >> refSeq;
            for (size_t i = 0; i < bams.size(); i++) bam_destroy1(bams[i]);
            bams.clear();
            cands = AlignedCandidates();
        } else if (tok == "READ") {
            int pos, flag, mapq;
            string cig, seq;
            is >> pos >> flag >> mapq >> cig >> seq;
            bams.push_back(make_bam(pos, flag, mapq, cig, seq));
        } else if (tok == "VAR") {
            int pos, addComb;
            string vs;
            is >> pos >> addComb >> vs;
            cands.variants.push_back(
                AlignedVariant(vs, pos, -1.0, addComb != 0));
        } else if (tok == "RUN") {
            try {
                HaplotypeDistribution hd(midPos, refSeq, refSeqStart);
                for (size_t i = 0; i < bams.size(); i++)
                    hd.insertRead(bams[i]);
                hd.setFrequencies();
                HDIterator2 hdi(hd, maxHap, midPos, leftPos, rightPos,
                                noIndelWindow);
                vector<Haplotype> haps;
                hdi.generateHapsWithAlignedVariants(haps, cands, 0,
                                                    changeN != 0);
                cout << "OK " << hdi.start() << " " << hdi.end() << " "
                     << hdi.getLogNumHaps() << "\n";
                for (size_t h = 0; h < haps.size(); h++)
                    cout << "HAP " << haps[h].seq << " " << haps[h].freq
                         << "\n";
            } catch (string s) {
                cout << "ERR " << s << "\n";
            }
            cout << "ENDCASE" << endl;
        }
    }
    for (size_t i = 0; i < bams.size(); i++) bam_destroy1(bams[i]);
    return 0;
}

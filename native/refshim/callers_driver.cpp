/* Differential-test driver for the reference Bayesian callers:
 * DetInDel::diploidGLF (DInDel.cpp:2933-3662),
 * DetInDel::estimateHaplotypeFrequenciesBayesEM (DInDel.cpp:2103-2930) and
 * DetInDel::filterHaplotypes (DInDel.cpp:1929-2101), compiled from the
 * unmodified reference DInDel.cpp with stub bam/boost headers.  The liks
 * matrix, haplotypes, reads and candidate variants are injected over stdin;
 * the GLF rows the callers emit are written to the file given as argv[1]
 * (keeping them clear of the callers' own stdout logging).
 *
 * stdin protocol (line oriented, one or more windows):
 *   WINDOW tid index candPos leftPos rightPos filterHaps priorIndel priorSNP
 *          bayesa0 padCover maxMismatch nBams program analysis(dip|pooled|both)
 *   CAND pos freq addComb str
 *   HAP seq
 *   HI pos str startHap endHap startRead endRead lfh rfh lfr rfr   (hap indel)
 *   HS pos str startHap endHap startRead endRead lfh rfh lfr rfr   (hap snp)
 *   READ mapQual flag poolID pos matePos seq
 *   LIK h r ll offHap offHapHMQ numIndels nBQT nmmBQT mLogBQ nMMLeft nMMRight numMismatch
 *   HPOS h r v0 v1 ...
 *   LIND h r pos str startHap endHap startRead endRead lfh rfh lfr rfr
 *   LSNP h r pos str startHap endHap startRead endRead lfh rfh lfr rfr
 *   LCOVI h r pos 0|1     (ml.hapIndelCovered)
 *   LCOVS h r pos 0|1     (ml.hapSNPCovered)
 *   RUN
 * after each RUN the driver prints "ENDWINDOW" (or "ERR <msg>" first if the
 * caller threw) on stdout and flushes the GLF file.
 */
#include <cstdio>
#include <unistd.h>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#define protected public  /* the callers are protected members of DetInDel */
#include "DInDel.hpp"
#undef protected

using namespace std;

static AlignedVariant read_av(istringstream &is, int &pos) {
    string str;
    int sh, eh, sr, er, lfh, rfh, lfr, rfr;
    is >> pos >> str >> sh >> eh >> sr >> er >> lfh >> rfh >> lfr >> rfr;
    AlignedVariant av(str, sh, eh, sr, er);
    av.setFlanking(lfh, rfh, lfr, rfr);
    return av;
}

int main(int argc, char **argv) {
    if (argc < 2) {
        cerr << "usage: callers_driver <glf-output-file>" << endl;
        return 2;
    }
    ofstream glfOut(argv[1]);

    string tid = "1", program = "singlevariant", analysis = "dip";
    int index = 0, nBams = 1;
    uint32_t candPos = 0, leftPos = 0, rightPos = 0;
    int filterHaps = 0, padCover = 2, maxMismatch = 2;
    double priorIndel = 1e-4, priorSNP = 1e-3, bayesa0 = 0.001;
    vector<Haplotype> haps;
    vector<Read> reads;
    vector<vector<MLAlignment> > liks;
    AlignedCandidates cands;

    string line;
    while (getline(cin, line)) {
        if (line.empty()) continue;
        istringstream is(line);
        string tok;
        is >> tok;
        if (tok == "WINDOW") {
            is >> tid >> index >> candPos >> leftPos >> rightPos >> filterHaps
               >> priorIndel >> priorSNP >> bayesa0 >> padCover >> maxMismatch
               >> nBams >> program >> analysis;
            haps.clear();
            reads.clear();
            liks.clear();
            cands = AlignedCandidates();
        } else if (tok == "CAND") {
            int pos, addComb;
            double freq;
            string str;
            is >> pos >> freq >> addComb >> str;
            cands.variants.push_back(
                AlignedVariant(str, pos, freq, addComb != 0));
        } else if (tok == "HAP") {
            Haplotype h;
            is >> h.seq;
            haps.push_back(h);
        } else if (tok == "HI" || tok == "HS") {
            int pos;
            AlignedVariant av = read_av(is, pos);
            if (tok == "HI") haps.back().indels[pos] = av;
            else haps.back().snps[pos] = av;
        } else if (tok == "READ") {
            Read r;
            int flag, poolID, pos, matePos;
            is >> r.mapQual >> flag >> poolID >> pos >> matePos >> r.seq.seq;
            bam1_t *b = bam_init1();
            b->core.flag = flag;
            b->core.pos = pos;
            b->core.l_qname = 2;
            b->data = (uint8_t *)calloc(2, 1);
            b->data[0] = 'r';
            r.bam = b;
            r.initBam = true;
            r.onReverseStrand = (flag & BAM_FREVERSE) != 0;
            r.poolID = poolID;
            r.pos = pos;
            r.matePos = matePos;
            r.qual.assign(r.seq.seq.size(), 0.999);
            reads.push_back(r);
            if (liks.empty())
                liks.resize(haps.size());
        } else if (tok == "LIK") {
            size_t h, rr;
            is >> h >> rr;
            if (liks.size() != haps.size()) liks.resize(haps.size());
            if (liks[h].size() <= rr) liks[h].resize(reads.size());
            MLAlignment &ml = liks[h][rr];
            int offHap, offHapHMQ;
            is >> ml.ll >> offHap >> offHapHMQ >> ml.numIndels >> ml.nBQT
               >> ml.nmmBQT >> ml.mLogBQ >> ml.nMMLeft >> ml.nMMRight
               >> ml.numMismatch;
            ml.offHap = offHap != 0;
            ml.offHapHMQ = offHapHMQ != 0;
        } else if (tok == "HPOS") {
            size_t h, rr;
            is >> h >> rr;
            int v;
            vector<int> &hp = liks[h][rr].hpos;
            hp.clear();
            while (is >> v) hp.push_back(v);
            /* filterHaplotypes loops b<=hpos.size() (DInDel.cpp:1995,2040),
             * reading one int past the vector end — undefined behavior whose
             * result depends on heap garbage even in the real reference
             * binary.  Pin that phantom element to INT_MIN (never inside a
             * flank interval) so the driver's behavior is deterministic and
             * equals the defined-behavior subset our port implements. */
            hp.push_back(-2147483648);
            hp.pop_back();
        } else if (tok == "LIND" || tok == "LSNP") {
            size_t h, rr;
            is >> h >> rr;
            int pos;
            AlignedVariant av = read_av(is, pos);
            if (tok == "LIND") liks[h][rr].indels[pos] = av;
            else liks[h][rr].snps[pos] = av;
        } else if (tok == "LCOVI" || tok == "LCOVS") {
            size_t h, rr;
            int pos, val;
            is >> h >> rr >> pos >> val;
            if (tok == "LCOVI") liks[h][rr].hapIndelCovered[pos] = val != 0;
            else liks[h][rr].hapSNPCovered[pos] = val != 0;
        } else if (tok == "RUN") {
            // a DetInDel whose MyBams are inert stubs (bam.h dummy open);
            // nBams controls the per-pool GLF rows of the pooled caller
            DetInDel::Parameters params(tid, string("out"), "probabilistic");
            params.tid = tid;
            params.alignAgainstReference = false;
            params.filterHaplotypes = filterHaps != 0;
            params.priorIndel = priorIndel;
            params.priorSNP = priorSNP;
            params.bayesa0 = bayesa0;
            params.obsParams.padCover = padCover;
            params.obsParams.maxMismatch = maxMismatch;
            params.outputGLF = true;
            params.outputPooledLikelihoods = false;
            params.showHapAlignments = false;
            params.quiet = true;
            char tmpl[] = "/tmp/refshim_bams_XXXXXX";
            int fd = mkstemp(tmpl);
            {
                ofstream bf(tmpl);
                for (int b = 0; b < nBams; b++)
                    bf << "dummy" << b << ".bam\n";
            }
            DetInDel det(string(tmpl), params, 1);
            close(fd);
            remove(tmpl);
            OutputData glfData = params.makeGLFOutputData(glfOut);
            try {
                vector<double> hapFreqs;
                vector<DetInDel::HapEstResult> her;
                if (analysis == "pooled" || analysis == "both")
                    det.estimateHaplotypeFrequenciesBayesEM(
                        haps, reads, liks, hapFreqs, her, candPos, leftPos,
                        rightPos, glfData, index, cands, program);
                if (analysis == "dip" || analysis == "both") {
                    hapFreqs.clear();
                    her.clear();
                    det.diploidGLF(haps, reads, liks, hapFreqs, her, candPos,
                                   leftPos, rightPos, glfData, index, cands,
                                   "dip");
                }
            } catch (string s) {
                cout << "ERR " << s << endl;
            }
            glfOut.flush();
            cout << "ENDWINDOW" << endl;
        }
    }
    return 0;
}

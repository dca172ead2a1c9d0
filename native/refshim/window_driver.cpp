/* Composed whole-window differential driver: runs the UNMODIFIED
 * reference DetInDel::detectIndels (DInDel.cpp:1265-1417) — getReads ->
 * getHaplotypes -> computeLikelihoods(Faster) -> diploidGLF /
 * estimateHaplotypeFrequenciesBayesEM -> GLF rows, including the
 * error-path rows (DInDel.cpp:1391-1402) — on synthetic bam1_t streams
 * (via the bam.h stub fetch hooks) and an in-memory FASTA (via the
 * faidx.h stub hook).  This proves the L5 glue (hap-set assembly and
 * dedup, empiricalDistributionMethod sequencing DInDel.cpp:380-640, GLF
 * field population DInDel.cpp:3618-3655) equal to the reference, not
 * just the individual layers.
 *
 * stdin protocol (line oriented):
 *   SET <name> <value>     parameter by reference CLI flag name
 *                          (getParameters, DInDel.cpp:3908-3977)
 *   FASTA <tid> <seq>      reference contig (fai_stub_fetch source)
 *   NBAMS <n>              number of BAM files (pooled; default 1)
 *   REC <file> <qname> <flag> <pos> <mapq> <mtid> <mpos> <cigar> <seq> <q,..>
 *                          one aligned record for BAM ordinal <file>
 *   VAR <verbatim window-file line>
 *   RUN
 * after RUN the driver executes detectIndels over all VAR lines and
 * prints every line of the resulting .glf.txt prefixed with "G ", then
 * "ENDRUN"; reference logging goes to stderr/stdout unprefixed.
 */
#include <cstdio>
#include <cstring>
#include <unistd.h>
#include <fstream>
#include <iostream>
#include <map>
#include <new>
#include <sstream>
#include <string>
#include <vector>

/* The reference's --faster path reads UNINITIALIZED MLAlignment stat
 * fields: nBQT/nmmBQT/mLogBQ/nMMLeft/nMMRight are set by neither the
 * MLAlignment ctor (MLAlignment.hpp:35-48) nor Faster.cpp, yet
 * diploidGLF folds them into GLF columns (DInDel.cpp:3530-3534) — heap
 * garbage even in the real reference binary.  Zero every heap
 * allocation so the driver pins that UB to the defined-behavior subset
 * our port implements (fields = 0, mLogBQ/nBQT = 0.0/0.0 = -nan), the
 * same technique as the callers_driver hpos phantom-element pin. */
void *operator new(size_t n) {
    void *p = calloc(1, n ? n : 1);
    if (!p) throw std::bad_alloc();
    return p;
}
void *operator new[](size_t n) { return operator new(n); }
void operator delete(void *p) noexcept { free(p); }
void operator delete[](void *p) noexcept { free(p); }
void operator delete(void *p, size_t) noexcept { free(p); }
void operator delete[](void *p, size_t) noexcept { free(p); }

#define protected public
#include "DInDel.hpp"
#undef protected

using namespace std;

struct Rec {
    bam1_t *b;
    uint32_t end;
};
static vector<vector<Rec> > g_files;        /* per-BAM record streams */
static map<string, string> g_fasta;         /* tid -> sequence */
static vector<string> g_fasta_order;

static int fetch_file_impl(int file, int tid, int beg, int end, void *data,
                           bam_fetch_f func) {
    if (file < 0 || file >= (int)g_files.size()) return 0;
    const vector<Rec> &recs = g_files[file];
    for (size_t i = 0; i < recs.size(); ++i) {
        const bam1_t *b = recs[i].b;
        if (b->core.tid != tid) continue;
        if (b->core.pos < end && (int)recs[i].end > beg)
            func(b, data);
        else if (b->core.pos >= end)
            break;
    }
    return 0;
}

/* faidx-style fetch: region "tid:start-end", 1-based inclusive, clamped
 * to the contig like the real samtools faidx. */
static char *fai_fetch_impl(const char *reg, int *len) {
    string r(reg);
    size_t c = r.rfind(':');
    if (c == string::npos) { *len = 0; return (char *)calloc(1, 1); }
    string tid = r.substr(0, c);
    long start = 0, end = 0;
    if (sscanf(r.c_str() + c + 1, "%ld-%ld", &start, &end) != 2) {
        *len = 0;
        return (char *)calloc(1, 1);
    }
    map<string, string>::const_iterator it = g_fasta.find(tid);
    if (it == g_fasta.end()) { *len = 0; return (char *)calloc(1, 1); }
    const string &seq = it->second;
    if (start < 1) start = 1;
    if (end > (long)seq.size()) end = (long)seq.size();
    if (start > end) { *len = 0; return (char *)calloc(1, 1); }
    *len = (int)(end - start + 1);
    char *out = (char *)malloc(*len + 1);
    memcpy(out, seq.data() + (start - 1), *len);
    out[*len] = 0;
    return out;
}

static int nt16(char c) {
    switch (c) {
    case 'A': return 1;
    case 'C': return 2;
    case 'G': return 4;
    case 'T': return 8;
    default: return 15;
    }
}

static bam1_t *make_rec(const string &qname, int flag, int pos, int mapq,
                        int tid, int mtid, int mpos, const string &cigar,
                        const string &seq, const vector<int> &quals) {
    vector<uint32_t> cig;
    int num = 0;
    for (size_t i = 0; i < cigar.size(); ++i) {
        char c = cigar[i];
        if (c >= '0' && c <= '9') num = num * 10 + (c - '0');
        else {
            int op = 0;
            switch (c) {
            case 'M': op = BAM_CMATCH; break;
            case 'I': op = BAM_CINS; break;
            case 'D': op = BAM_CDEL; break;
            case 'N': op = BAM_CREF_SKIP; break;
            case 'S': op = BAM_CSOFT_CLIP; break;
            case 'H': op = BAM_CHARD_CLIP; break;
            default: op = BAM_CMATCH;
            }
            cig.push_back((uint32_t)(num << BAM_CIGAR_SHIFT) | op);
            num = 0;
        }
    }
    if (cigar == "*") cig.clear();
    int l_qname = (int)qname.size() + 1;
    int l_qseq = (int)seq.size();
    int dlen = l_qname + 4 * (int)cig.size() + (l_qseq + 1) / 2 + l_qseq;
    bam1_t *b = (bam1_t *)calloc(1, sizeof(bam1_t));
    b->data = (uint8_t *)calloc(1, dlen);
    b->data_len = b->m_data = dlen;
    b->l_aux = 0;
    b->core.tid = tid;
    b->core.pos = pos;
    b->core.qual = mapq;
    b->core.l_qname = l_qname;
    b->core.flag = flag;
    b->core.n_cigar = (uint16_t)cig.size();
    b->core.l_qseq = l_qseq;
    b->core.mtid = mtid;
    b->core.mpos = mpos;
    memcpy(b->data, qname.c_str(), l_qname);
    memcpy(b->data + l_qname, cig.data(), 4 * cig.size());
    uint8_t *s = bam1_seq(b);
    for (int i = 0; i < l_qseq; ++i)
        s[i >> 1] |= nt16(seq[i]) << 4 * (1 - (i & 1));
    uint8_t *q = (uint8_t *)bam1_qual(b);
    for (int i = 0; i < l_qseq; ++i)
        q[i] = (uint8_t)quals[i];
    return b;
}

static string g_libname;
static const char *get_library_impl(const bam1_t *b) {
    (void)b;
    return g_libname.empty() ? 0 : g_libname.c_str();
}

int main() {
    bam_stub_fetch_file = fetch_file_impl;
    fai_stub_fetch = fai_fetch_impl;
    bam_stub_get_library = get_library_impl;

    DetInDel::Parameters params(string("1"), string(""), "probabilistic");
    params.quiet = true;
    params.showHapDist = false;
    params.outputGLF = true;
    params.alignAgainstReference = true;
    params.refFileName = "stub.fa";
    params.inferenceMethod = "empirical";
    int nbams = 1;
    g_files.resize(1);
    vector<string> varLines;
    string libFile;

    string line;
    while (getline(cin, line)) {
        if (line.empty()) continue;
        istringstream is(line);
        string tok;
        is >> tok;
        if (tok == "SET") {
            string k;
            is >> k;
            /* reference CLI flag name -> Parameters field
             * (getParameters, DInDel.cpp:3908-3977) */
            if (k == "tid") is >> params.tid;
            else if (k == "maxHap") is >> params.maxHap;
            else if (k == "maxRead") is >> params.maxReads;
            else if (k == "width") is >> params.width;
            else if (k == "mapQualThreshold") is >> params.mapQualThreshold;
            else if (k == "skipMaxHap") is >> params.skipMaxHap;
            else if (k == "minReadOverlap") is >> params.minReadOverlap;
            else if (k == "maxReadLength") is >> params.maxReadLength;
            else if (k == "maxHapReadProd") is >> params.maxHapReadProd;
            else if (k == "priorSNP") is >> params.priorSNP;
            else if (k == "priorIndel") is >> params.priorIndel;
            else if (k == "bayesa0") is >> params.bayesa0;
            else if (k == "bayesType") is >> params.bayesType;
            else if (k == "pError") is >> params.obsParams.pError;
            else if (k == "pMut") is >> params.obsParams.pMut;
            else if (k == "maxLengthIndel") {
                is >> params.obsParams.maxLengthIndel;
                params.obsParams.maxLengthDel = params.obsParams.maxLengthIndel;
            } else if (k == "capMapQualThreshold")
                is >> params.obsParams.mapQualThreshold;
            else if (k == "capMapQualFast") is >> params.obsParams.capMapQualFast;
            else if (k == "flankRefSeq") is >> params.obsParams.padCover;
            else if (k == "flankMaxMismatch") is >> params.obsParams.maxMismatch;
            else if (k == "checkAllCIGARs") is >> params.checkAllCIGARs;
            else if (k == "EMtol") is >> params.EMtol;
            else if (k == "noIndelWindow") is >> params.noIndelWindow;
            else {
                int v;
                is >> v;
                if (k == "varFileIsOneBased") params.varFileIsOneBased = v != 0;
                else if (k == "doDiploid") params.doDiploid = v != 0;
                else if (k == "doPooled") params.estimateHapFreqs = v != 0;
                else if (k == "faster") params.slower = v == 0;
                else if (k == "filterHaplotypes") params.filterHaplotypes = v != 0;
                else if (k == "mapUnmapped") {
                    /* the binary's obsParams.mapUnmappedReads assignment
                     * is commented out (DInDel.cpp:3979-3986): the
                     * insert-size positional prior stays DEAD even with
                     * --mapUnmapped — only the getReads remapping runs */
                    params.mapUnmappedReads = v != 0;
                } else if (k == "changeINStoN") params.changeINStoN = v != 0;
                else if (k == "quiet") params.quiet = v != 0;
                else {
                    fprintf(stderr, "unknown SET %s\n", k.c_str());
                    return 2;
                }
            }
        } else if (tok == "FASTA") {
            string tid, seq;
            is >> tid >> seq;
            if (g_fasta.find(tid) == g_fasta.end()) g_fasta_order.push_back(tid);
            g_fasta[tid] = seq;
        } else if (tok == "LIBFILE") {
            is >> libFile;
        } else if (tok == "LIBNAME") {
            /* every synthetic read reports this library name
             * (Read.hpp:185-193 via the bam.h bam_get_library stub) */
            is >> g_libname;
        } else if (tok == "NBAMS") {
            is >> nbams;
            g_files.resize(nbams);
        } else if (tok == "REC") {
            int file;
            string qname, cigar, seq, qstr;
            int flag, pos, mapq, mtid, mpos;
            is >> file >> qname >> flag >> pos >> mapq >> mtid >> mpos
               >> cigar >> seq >> qstr;
            vector<int> quals;
            istringstream qs(qstr);
            string part;
            while (getline(qs, part, ','))
                quals.push_back(atoi(part.c_str()));
            /* Records live on contig 0 (single-contig windows; the
             * mate's <mtid> may still differ to exercise cross-tid
             * mate filtering). */
            bam1_t *b = make_rec(qname, flag, pos, mapq, 0, mtid, mpos,
                                 cigar, seq, quals);
            Rec r;
            r.b = b;
            r.end = b->core.n_cigar ? bam_calend(&b->core, bam1_cigar(b))
                                    : (uint32_t)(b->core.pos + 1);
            if (file >= (int)g_files.size()) g_files.resize(file + 1);
            g_files[file].push_back(r);
        } else if (tok == "VAR") {
            string rest;
            getline(is, rest);
            size_t st = rest.find_first_not_of(' ');
            varLines.push_back(st == string::npos ? rest : rest.substr(st));
        } else if (tok == "RUN") {
            /* stub header: targets in FASTA insertion order */
            static bam_header_t hdr;
            static vector<char *> names;
            static vector<uint32_t> lens;
            names.clear();
            lens.clear();
            for (size_t i = 0; i < g_fasta_order.size(); ++i) {
                names.push_back(strdup(g_fasta_order[i].c_str()));
                lens.push_back((uint32_t)g_fasta[g_fasta_order[i]].size());
            }
            hdr.n_targets = (int)names.size();
            hdr.target_name = names.data();
            hdr.target_len = lens.data();
            bam_stub_header = &hdr;

            char tmpl[] = "/tmp/window_driver_XXXXXX";
            if (!mkdtemp(tmpl)) return 3;
            string dir(tmpl);
            string bamsFile = dir + "/bams.txt";
            {
                ofstream bf(bamsFile.c_str());
                for (int b = 0; b < nbams; ++b)
                    bf << "stub" << b << ".bam\n";
            }
            string varFile = dir + "/vars.txt";
            {
                ofstream vf(varFile.c_str());
                for (size_t i = 0; i < varLines.size(); ++i)
                    vf << varLines[i] << "\n";
            }
            params.fileName = dir + "/out";
            bam_stub_open_count = 0;  /* MyBam opens -> ordinals 0..n-1 */
            DetInDel det(bamsFile, params, 1);
            /* insert-size libraries (DInDel.cpp:4268-4273): change the
             * fetch-window maxDev AND the unmapped-mate position model */
            if (!libFile.empty()) det.addLibrary(libFile);
            try {
                det.detectIndels(varFile);
            } catch (string s) {
                printf("FATAL %s\n", s.c_str());
            }
            {
                ifstream gf((params.fileName + ".glf.txt").c_str());
                string gl;
                while (getline(gf, gl))
                    printf("G %s\n", gl.c_str());
            }
            printf("ENDRUN\n");
            fflush(stdout);
        }
    }
    return 0;
}

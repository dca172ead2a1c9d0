/* Differential-test driver for GetCandidatesFromCIGAR::get
 * (GetCandidates.cpp:387-497): CIGAR indel extraction, SeqAn NW
 * left-alignment of every candidate, the variants.txt text format, and
 * the per-library insert-size histograms (outputLibraries,
 * GetCandidates.cpp:305-386).  Synthetic bam1_t records stream through
 * the sam.h stub's sam_stub_read hook; reference sequence fetches come
 * from a driver-parsed FASTA via the faidx stub hook.
 *
 * usage: candidates_driver <fasta> <out-prefix> <libname|->
 * stdin: REC qname flag tid pos mapq mtid mpos isize cigar seq q0,q1,...
 *        (EOF runs the extraction)
 */
#include <cstdio>
#include <cstring>
#include <unistd.h>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "sam.h"
#include "faidx.h"
#include "GetCandidates.hpp"

using namespace std;

static vector<bam1_t *> g_recs;
static size_t g_next = 0;
static string g_seq, g_lib;

static int read_impl(bam1_t *b) {
    if (g_next >= g_recs.size()) return -1;
    bam1_t *src = g_recs[g_next++];
    free(b->data);
    b->core = src->core;
    b->data_len = b->m_data = src->data_len;
    b->l_aux = src->l_aux;
    b->data = (uint8_t *)malloc(src->data_len);
    memcpy(b->data, src->data, src->data_len);
    return 1;
}

static char *fetch_impl(const char *reg, int *len) {
    // "tid:start-end", 1-based inclusive, faidx clamping semantics
    const char *colon = strrchr(reg, ':');
    long start = 1, end = (long)g_seq.size();
    if (colon) sscanf(colon + 1, "%ld-%ld", &start, &end);
    if (start < 1) start = 1;
    if (end > (long)g_seq.size()) end = (long)g_seq.size();
    if (end < start) { *len = 0; char *r = (char *)malloc(1); r[0] = 0; return r; }
    *len = (int)(end - start + 1);
    char *r = (char *)malloc(*len + 1);
    memcpy(r, g_seq.c_str() + (start - 1), *len);
    r[*len] = 0;
    return r;
}

static const char *lib_impl(const bam1_t *b) {
    (void)b;
    if (g_lib == "-") return 0;
    return g_lib.c_str();
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

int main(int argc, char **argv) {
    if (argc < 4) {
        cerr << "usage: candidates_driver <fasta> <out-prefix> <lib|->"
             << endl;
        return 2;
    }
    // parse single-contig FASTA
    {
        ifstream fa(argv[1]);
        string line;
        while (getline(fa, line)) {
            if (line.empty() || line[0] == '>') continue;
            g_seq += line;
        }
    }
    g_lib = argv[3];

    static bam_header_t hdr;
    static char name1[] = "1";
    static char *names[] = {name1};
    static uint32_t lens[] = {1000000000u};
    hdr.n_targets = 1;
    hdr.target_name = names;
    hdr.target_len = lens;
    bam_stub_header = &hdr;
    sam_stub_read = read_impl;
    fai_stub_fetch = fetch_impl;
    bam_stub_get_library = lib_impl;

    string line;
    while (getline(cin, line)) {
        if (line.empty()) continue;
        istringstream is(line);
        string tok;
        is >> tok;
        if (tok != "REC") continue;
        string qname, cigar, seq, qstr;
        int flag, tid, pos, mapq, mtid, mpos, isize;
        is >> qname >> flag >> tid >> pos >> mapq >> mtid >> mpos >> isize
           >> cigar >> seq >> qstr;
        vector<int> quals;
        istringstream qs(qstr);
        string part;
        while (getline(qs, part, ','))
            quals.push_back(atoi(part.c_str()));
        vector<uint32_t> cig;
        int num = 0;
        for (size_t i = 0; i < cigar.size(); ++i) {
            char c = cigar[i];
            if (c >= '0' && c <= '9') num = num * 10 + (c - '0');
            else {
                int op = BAM_CMATCH;
                switch (c) {
                case 'M': op = BAM_CMATCH; break;
                case 'I': op = BAM_CINS; break;
                case 'D': op = BAM_CDEL; break;
                case 'S': op = BAM_CSOFT_CLIP; break;
                case 'H': op = BAM_CHARD_CLIP; break;
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
        b->core.tid = tid;
        b->core.pos = pos;
        b->core.qual = mapq;
        b->core.l_qname = l_qname;
        b->core.flag = flag;
        b->core.n_cigar = (uint16_t)cig.size();
        b->core.l_qseq = l_qseq;
        b->core.mtid = mtid;
        b->core.mpos = mpos;
        b->core.isize = isize;
        memcpy(b->data, qname.c_str(), l_qname);
        memcpy(b->data + l_qname, cig.data(), 4 * cig.size());
        uint8_t *s = bam1_seq(b);
        for (int i = 0; i < l_qseq; ++i)
            s[i >> 1] |= nt16(seq[i]) << 4 * (1 - (i & 1));
        uint8_t *q = (uint8_t *)bam1_qual(b);
        for (int i = 0; i < l_qseq; ++i)
            q[i] = (uint8_t)quals[i];
        g_recs.push_back(b);
    }

    GetCandidatesFromCIGAR gc;
    try {
        gc.get(string("fake.bam"), string(argv[2]), string(argv[1]));
    } catch (string s) {
        cerr << "EXC " << s << endl;
        return 3;
    }
    return 0;
}

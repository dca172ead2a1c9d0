/* Differential-test driver for DetInDel::getReads (DInDel.cpp:885-1262):
 * the sliding read buffer, fetch-window uint32 arithmetic, mate pairing,
 * the filter cascade, the UNSTABLE mapQual std::sort and the maxReads
 * cap.  Synthetic bam1_t records are injected through the bam.h stub's
 * bam_stub_fetch hook; windows run in sequence against the same
 * readBuffer with detectIndels' reset policy (reset after an error).
 *
 * stdin protocol (line oriented):
 *   CONFIG tid minReadOverlap maxReads maxReadLength mapQualThreshold
 *          mapUnmappedReads
 *   REC qname flag pos mapq mtid mpos cigar seq qual0,qual1,...
 *   WINDOW leftPos rightPos
 *   RUN
 * after each RUN the driver processes all queued WINDOWs in order; per
 * window it prints either "ERR <msg>" or one line per surviving read:
 *   R <qname> <pos> <mapQual %.17g> <matePos> <mateLen> <reverse> <seq>
 * then "ENDWINDOW".
 */
#include <cstdio>
#include <cstring>
#include <unistd.h>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#define protected public
#include "DInDel.hpp"
#undef protected

using namespace std;

struct Rec {
    bam1_t *b;
    uint32_t end;
};
static vector<Rec> g_recs;

static int fetch_impl(int tid, int beg, int end, void *data,
                      bam_fetch_f func) {
    for (size_t i = 0; i < g_recs.size(); ++i) {
        const bam1_t *b = g_recs[i].b;
        if (b->core.tid != tid) continue;
        if (b->core.pos < end && (int)g_recs[i].end > beg)
            func(b, data);
        else if (b->core.pos >= end)
            break;
    }
    return 0;
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
                        int mtid, int mpos, const string &cigar,
                        const string &seq, const vector<int> &quals) {
    // parse cigar like 30M2D40M
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
    b->core.tid = 0;
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

int main() {
    // stub header with one target so MyBam::getTID works
    static bam_header_t hdr;
    static char name1[] = "1";
    static char *names[] = {name1};
    static uint32_t lens[] = {1000000000u};
    hdr.n_targets = 1;
    hdr.target_name = names;
    hdr.target_len = lens;
    bam_stub_header = &hdr;
    bam_stub_fetch = fetch_impl;

    string tid = "1";
    DetInDel::Parameters params(tid, string("out"), "probabilistic");
    params.tid = tid;
    params.alignAgainstReference = false;
    params.quiet = true;

    char tmpl[] = "/tmp/getreads_bamsXXXXXX";
    int fd = mkstemp(tmpl);
    const char *one = "fake.bam\n";
    ssize_t wr = write(fd, one, strlen(one));
    (void)wr;
    close(fd);

    DetInDel *det = 0;

    vector<pair<uint32_t, uint32_t> > windows;
    vector<Read *> readBuffer;
    uint32_t oldLeftPos = 0, oldRightFetchReadPos = 0;
    bool reset = true;

    string line;
    while (getline(cin, line)) {
        if (line.empty()) continue;
        istringstream is(line);
        string tok;
        is >> tok;
        if (tok == "CONFIG") {
            int mapUnmapped;
            is >> params.tid >> params.minReadOverlap >> params.maxReads
               >> params.maxReadLength >> params.mapQualThreshold
               >> mapUnmapped;
            params.mapUnmappedReads = mapUnmapped != 0;
            det = new DetInDel(string(tmpl), params, 1);
        } else if (tok == "REC") {
            string qname, cigar, seq, qstr;
            int flag, pos, mapq, mtid, mpos;
            is >> qname >> flag >> pos >> mapq >> mtid >> mpos >> cigar
               >> seq >> qstr;
            vector<int> quals;
            istringstream qs(qstr);
            string part;
            while (getline(qs, part, ','))
                quals.push_back(atoi(part.c_str()));
            bam1_t *b = make_rec(qname, flag, pos, mapq, mtid, mpos, cigar,
                                 seq, quals);
            Rec r;
            r.b = b;
            r.end = b->core.n_cigar ? bam_calend(&b->core, bam1_cigar(b))
                                    : (uint32_t)(b->core.pos + 1);
            g_recs.push_back(r);
        } else if (tok == "WINDOW") {
            uint32_t l, r;
            is >> l >> r;
            windows.push_back(make_pair(l, r));
        } else if (tok == "RUN") {
            for (size_t w = 0; w < windows.size(); ++w) {
                uint32_t leftPos = windows[w].first;
                uint32_t rightPos = windows[w].second;
                vector<Read> reads;
                bool err = false;
                try {
                    det->getReads(leftPos, rightPos, reads, oldLeftPos,
                                  oldRightFetchReadPos, readBuffer, reset);
                } catch (string s) {
                    for (size_t x = 0; x < s.size(); ++x)
                        if (s[x] == ' ') s[x] = '_';
                    printf("ERR %s\n", s.c_str());
                    err = true;
                }
                if (!err) {
                    for (size_t r = 0; r < reads.size(); ++r) {
                        printf("R %s %d %.17g %d %d %d %s\n",
                               bam1_qname(reads[r].getBam()),
                               reads[r].pos, reads[r].mapQual,
                               reads[r].matePos, reads[r].mateLen,
                               reads[r].isReverse() ? 1 : 0,
                               reads[r].seq.seq.c_str());
                    }
                }
                printf("ENDWINDOW\n");
                reset = err;
                oldLeftPos = leftPos;
            }
            windows.clear();
            fflush(stdout);
        }
    }
    return 0;
}

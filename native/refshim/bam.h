/* Minimal stub of the samtools-0.1.19 bam.h API surface, just enough to
 * compile the reference observation-model translation units for differential
 * testing. Written from the BAM spec + the call sites in /root/reference;
 * no samtools code. Functions that would touch real BAM files abort. */
#ifndef BAM_STUB_H
#define BAM_STUB_H

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    int32_t tid;
    int32_t pos;
    uint32_t bin : 16, qual : 8, l_qname : 8;
    uint32_t flag : 16, n_cigar : 16;
    int32_t l_qseq;
    int32_t mtid;
    int32_t mpos;
    int32_t isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    int l_aux, data_len, m_data;
    uint8_t *data;
} bam1_t;

typedef struct {
    int32_t n_targets;
    char **target_name;
    uint32_t *target_len;
    size_t l_text, n_text;
    char *text;
    void *dict, *rg2lib;
    void *hash;
} bam_header_t;

typedef void *bamFile;
typedef struct { int unused; } bam_index_t;

#define BAM_CIGAR_SHIFT 4
#define BAM_CIGAR_MASK 0xf

#define BAM_CMATCH 0
#define BAM_CINS 1
#define BAM_CDEL 2
#define BAM_CREF_SKIP 3
#define BAM_CSOFT_CLIP 4
#define BAM_CHARD_CLIP 5
#define BAM_CPAD 6

#define BAM_FPAIRED 1
#define BAM_FPROPER_PAIR 2
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024

#define bam1_qname(b) ((char*)((b)->data))
#define bam1_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam1_seq(b) ((b)->data + (b)->core.n_cigar*4 + (b)->core.l_qname)
#define bam1_qual(b) ((b)->data + (b)->core.n_cigar*4 + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1))
#define bam1_seqi(s, i) ((s)[(i)>>1] >> 4*(1-((i)&1)) & 0xf)
#define bam1_aux(b) ((b)->data + (b)->core.n_cigar*4 + (b)->core.l_qname + (b)->core.l_qseq + (((b)->core.l_qseq + 1)>>1))

static const char bam_nt16_rev_table_arr[] = "=ACMGRSVTWYHKDBN";
#define bam_nt16_rev_table bam_nt16_rev_table_arr

static inline uint32_t bam_calend(const bam1_core_t *c, const uint32_t *cigar) {
    uint32_t end = (uint32_t)c->pos;
    for (uint32_t k = 0; k < c->n_cigar; ++k) {
        int op = cigar[k] & BAM_CIGAR_MASK;
        if (op == BAM_CMATCH || op == BAM_CDEL || op == BAM_CREF_SKIP)
            end += cigar[k] >> BAM_CIGAR_SHIFT;
    }
    return end;
}

/* "Opening" returns inert dummies; this lets differential-test drivers
 * construct a DetInDel whose MyBam members are never actually read.
 * Drivers that need REAL record delivery (getReads differential
 * testing) install the weak hooks below: bam_stub_fetch replays
 * synthetic records, bam_stub_header supplies a header with targets. */
typedef int (*bam_fetch_f)(const bam1_t *b, void *data);
__attribute__((weak)) int (*bam_stub_fetch)(int tid, int beg, int end, void *data, bam_fetch_f func) = 0;
__attribute__((weak)) bam_header_t *bam_stub_header = 0;
/* Optional per-file variant: when set, each bam_open() is assigned an
 * ordinal (0,1,2,... in open order) and fetches pass it through, so a
 * driver can replay DIFFERENT record streams for the multiple BAM files
 * of a pooled run (DInDel.cpp:982 fetches via myBams[b]->bf). */
__attribute__((weak)) int (*bam_stub_fetch_file)(int file_ordinal, int tid, int beg, int end, void *data, bam_fetch_f func) = 0;
__attribute__((weak)) int bam_stub_open_count = 0;

static inline bamFile bam_open(const char *fn, const char *mode) {
    (void)fn; (void)mode;
    int *p = (int *)malloc(sizeof(int));
    *p = bam_stub_open_count++;
    return (bamFile)p;
}
static inline void bam_close(bamFile f) { free(f); }
static inline bam_header_t *bam_header_read(bamFile f) { (void)f; if (bam_stub_header) return bam_stub_header; return (bam_header_t*)calloc(1, sizeof(bam_header_t)); }
static inline void bam_header_destroy(bam_header_t *h) { if (h != bam_stub_header) free(h); }
static inline bam_index_t *bam_index_load(const char *fn) { (void)fn; return (bam_index_t*)calloc(1, sizeof(bam_index_t)); }
static inline void bam_index_destroy(bam_index_t *i) { free(i); }
static inline int bam_fetch(bamFile f, const bam_index_t *idx, int tid, int beg, int end, void *data, bam_fetch_f func) {
    (void)idx;
    if (bam_stub_fetch_file) return bam_stub_fetch_file(*(int *)f, tid, beg, end, data, func);
    (void)f;
    if (bam_stub_fetch) return bam_stub_fetch(tid, beg, end, data, func);
    abort(); return 0;
}
static inline int bam_write1(bamFile f, const bam1_t *b) { (void)f; (void)b; abort(); return 0; }
static inline int bam_header_write(bamFile f, const bam_header_t *h) { (void)f; (void)h; abort(); return 0; }
static inline bam1_t *bam_init1(void) { return (bam1_t*)calloc(1, sizeof(bam1_t)); }
static inline void bam_destroy1(bam1_t *b) { if (b) { free(b->data); free(b); } }
__attribute__((weak)) const char *(*bam_stub_get_library)(const bam1_t *b) = 0;
static inline const char *bam_get_library(bam_header_t *h, const bam1_t *b) {
    (void)h;
    if (bam_stub_get_library) return bam_stub_get_library(b);
    (void)b; return 0;
}

#endif

/* Stub sam.h — declarations only; drivers that need sequential record
 * delivery (GetCandidates differential testing) install the weak
 * sam_stub_read hook, which fills the caller's bam1_t and returns >=0,
 * or -1 at end of stream. */
#ifndef SAM_STUB_H
#define SAM_STUB_H
#include "bam.h"
typedef struct { void *x; bam_header_t *header; } samfile_t;

__attribute__((weak)) int (*sam_stub_read)(bam1_t *b) = 0;

static inline samfile_t *samopen(const char *fn, const char *mode, const void *aux) {
    (void)fn; (void)mode; (void)aux;
    if (sam_stub_read) {
        samfile_t *s = (samfile_t *)calloc(1, sizeof(samfile_t));
        s->header = bam_stub_header;
        return s;
    }
    abort(); return 0;
}
static inline void samclose(samfile_t *f) { free(f); }
static inline int samread(samfile_t *f, bam1_t *b) {
    (void)f;
    if (sam_stub_read) return sam_stub_read(b);
    abort(); return -1;
}
#endif

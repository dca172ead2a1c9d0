/* Stub faidx.h — declarations only; drivers that need real sequence
 * fetches (candidate left-alignment) install the weak fai_stub_fetch
 * hook, which receives the samtools-style region string "tid:start-end"
 * (1-based inclusive) and returns a malloc'd sequence + its length. */
#ifndef FAIDX_STUB_H
#define FAIDX_STUB_H
#include <stdlib.h>
typedef struct { int unused; } faidx_t;

__attribute__((weak)) char *(*fai_stub_fetch)(const char *reg, int *len) = 0;

static inline faidx_t *fai_load(const char *fn) {
    (void)fn;
    if (fai_stub_fetch) return (faidx_t *)calloc(1, sizeof(faidx_t));
    abort(); return 0;
}
static inline void fai_destroy(faidx_t *f) { free(f); }
static inline char *fai_fetch(const faidx_t *f, const char *reg, int *len) {
    (void)f;
    if (fai_stub_fetch) return fai_stub_fetch(reg, len);
    abort(); return 0;
}
#endif

/* Stub faidx.h — declarations only; never called in the shim. */
#ifndef FAIDX_STUB_H
#define FAIDX_STUB_H
#include <stdlib.h>
typedef struct { int unused; } faidx_t;
static inline faidx_t *fai_load(const char *fn) { (void)fn; abort(); return 0; }
static inline void fai_destroy(faidx_t *f) { (void)f; }
static inline char *fai_fetch(const faidx_t *f, const char *reg, int *len) { (void)f; (void)reg; (void)len; abort(); return 0; }
#endif

/* Stub sam.h — declarations only; never called in the shim. */
#ifndef SAM_STUB_H
#define SAM_STUB_H
#include "bam.h"
typedef struct { void *x; bam_header_t *header; } samfile_t;
static inline samfile_t *samopen(const char *fn, const char *mode, const void *aux) { (void)fn; (void)mode; (void)aux; abort(); return 0; }
static inline void samclose(samfile_t *f) { (void)f; }
static inline int samread(samfile_t *f, bam1_t *b) { (void)f; (void)b; abort(); return -1; }
#endif

/* Minimal MATLAB MEX API shim — TEST ORACLE ONLY.
 *
 * Lets the reference's self-contained MEX kernels
 * (/root/reference/matlab/mex/{shiftdt,features,resize,reduce,fconv}.cc)
 * compile standalone so golden-parity tests can compare this repo's
 * kernels against the *actual* reference code, not just our own NumPy
 * port. Implements exactly the mx- and mex-prefixed calls those five
 * files make.
 * No reference code lives here; the reference sources are compiled
 * in place from /root/reference by tests/refgold/__init__.py.
 */
#ifndef REFGOLD_MEX_H
#define REFGOLD_MEX_H

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef int mwSize;

typedef enum {
  mxUNKNOWN_CLASS = 0,
  mxCELL_CLASS,
  mxDOUBLE_CLASS,
  mxSINGLE_CLASS,
  mxINT32_CLASS
} mxClassID;

typedef enum { mxREAL = 0, mxCOMPLEX } mxComplexity;

typedef struct mxArray_tag mxArray;
struct mxArray_tag {
  mxClassID classid;
  int ndim;
  int dims[3]; /* the five target kernels use at most 3 dims */
  void *data;
  mxArray **cells;
  int ncells;
};

static inline size_t mx__elsize(mxClassID c) {
  return (c == mxSINGLE_CLASS || c == mxINT32_CLASS) ? 4 : 8;
}

static inline void mexErrMsgTxt(const char *msg) {
  fprintf(stderr, "mexErrMsgTxt: %s\n", msg);
  exit(2);
}

static inline void *mxCalloc(size_t n, size_t size) {
  return calloc(n ? n : 1, size);
}

static inline void mxFree(void *p) { free(p); }

static inline mxArray *mxCreateNumericArray(int ndim, const int *dims,
                                            mxClassID classid,
                                            mxComplexity /*flag*/) {
  mxArray *a = (mxArray *)calloc(1, sizeof(mxArray));
  a->classid = classid;
  a->ndim = ndim;
  size_t n = 1;
  for (int i = 0; i < ndim && i < 3; i++) {
    a->dims[i] = dims[i];
    n *= (size_t)(dims[i] > 0 ? dims[i] : 0);
  }
  a->data = calloc(n ? n : 1, mx__elsize(classid));
  return a;
}

static inline mxArray *mxCreateNumericMatrix(int m, int n, mxClassID classid,
                                             mxComplexity flag) {
  int dims[3] = {m, n, 1};
  return mxCreateNumericArray(2, dims, classid, flag);
}

static inline mxArray *mxCreateCellMatrix(int m, int n) {
  mxArray *a = (mxArray *)calloc(1, sizeof(mxArray));
  a->classid = mxCELL_CLASS;
  a->ndim = 2;
  a->dims[0] = m;
  a->dims[1] = n;
  a->dims[2] = 1;
  a->ncells = m * n;
  a->cells = (mxArray **)calloc(a->ncells ? a->ncells : 1, sizeof(mxArray *));
  return a;
}

static inline mxArray *mxGetCell(const mxArray *a, int i) { return a->cells[i]; }
static inline void mxSetCell(mxArray *a, int i, mxArray *v) { a->cells[i] = v; }
static inline void *mxGetPr(const mxArray *a) { return a->data; }
static inline int mxGetM(const mxArray *a) { return a->dims[0]; }

static inline int mxGetN(const mxArray *a) {
  int n = 1;
  for (int i = 1; i < a->ndim; i++) n *= a->dims[i];
  return n;
}

static inline double mxGetScalar(const mxArray *a) {
  switch (a->classid) {
    case mxDOUBLE_CLASS: return ((const double *)a->data)[0];
    case mxSINGLE_CLASS: return ((const float *)a->data)[0];
    case mxINT32_CLASS: return ((const int32_t *)a->data)[0];
    default: return 0.0;
  }
}

static inline const int *mxGetDimensions(const mxArray *a) { return a->dims; }
static inline int mxGetNumberOfDimensions(const mxArray *a) { return a->ndim; }

static inline int mxGetNumberOfElements(const mxArray *a) {
  if (a->classid == mxCELL_CLASS) return a->ncells;
  int n = 1;
  for (int i = 0; i < a->ndim; i++) n *= a->dims[i];
  return n;
}

static inline mxClassID mxGetClassID(const mxArray *a) { return a->classid; }

#endif /* REFGOLD_MEX_H */

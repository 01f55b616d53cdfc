/* extern "C" entry points over the reference MEX kernels — TEST ORACLE.
 *
 * The reference sources (/root/reference/matlab/mex/*.cc) are compiled
 * as separate TUs with -DmexFunction=mex_<name> (and -Dprocess=... for
 * the two files that define a `process` helper); this file marshals
 * plain buffers into mxArrays, calls the renamed mexFunction, and
 * copies results out. Column-major (MATLAB) layouts throughout — the
 * Python caller handles the transpose.
 */
#include "mex.h"

void mex_shiftdt(int, mxArray **, int, const mxArray **);
void mex_features(int, mxArray **, int, const mxArray **);
void mex_resize(int, mxArray **, int, const mxArray **);
void mex_reduce(int, mxArray **, int, const mxArray **);
void mex_fconv(int, mxArray **, int, const mxArray **);

namespace {

mxArray *make_matrix(const double *data, int m, int n) {
  mxArray *a = mxCreateNumericMatrix(m, n, mxDOUBLE_CLASS, mxREAL);
  memcpy(a->data, data, sizeof(double) * (size_t)m * n);
  return a;
}

mxArray *make_3d(const double *data, int d0, int d1, int d2) {
  int dims[3] = {d0, d1, d2};
  mxArray *a = mxCreateNumericArray(3, dims, mxDOUBLE_CLASS, mxREAL);
  memcpy(a->data, data, sizeof(double) * (size_t)d0 * d1 * d2);
  return a;
}

mxArray *make_scalar(double v) { return make_matrix(&v, 1, 1); }

void destroy(mxArray *a) {
  if (!a) return;
  if (a->cells) {
    for (int i = 0; i < a->ncells; i++) destroy(a->cells[i]);
    free(a->cells);
  }
  free(a->data);
  free(a);
}

} // namespace

extern "C" {

/* [M, Ix, Iy] = shiftdt(vals, ax, bx, ay, by, offx, offy, lenx, leny, step)
 * vals: (sizy, sizx) column-major; offx/offy are the MEX's 1-based
 * inputs; Ix/Iy come back 1-based as the MEX emits them. */
void refgold_shiftdt(const double *vals, int sizy, int sizx, double ax,
                     double bx, double ay, double by, int offx, int offy,
                     int lenx, int leny, double step, double *M, int32_t *Ix,
                     int32_t *Iy) {
  const mxArray *prhs[10] = {
      make_matrix(vals, sizy, sizx), make_scalar(ax),        make_scalar(bx),
      make_scalar(ay),               make_scalar(by),        make_scalar(offx),
      make_scalar(offy),             make_scalar(lenx),      make_scalar(leny),
      make_scalar(step)};
  mxArray *plhs[3] = {nullptr, nullptr, nullptr};
  mex_shiftdt(3, plhs, 10, prhs);
  memcpy(M, plhs[0]->data, sizeof(double) * (size_t)leny * lenx);
  memcpy(Ix, plhs[1]->data, sizeof(int32_t) * (size_t)leny * lenx);
  memcpy(Iy, plhs[2]->data, sizeof(int32_t) * (size_t)leny * lenx);
  for (int i = 0; i < 10; i++) destroy(const_cast<mxArray *>(prhs[i]));
  for (int i = 0; i < 3; i++) destroy(plhs[i]);
}

/* F = features(image, sbin): image (h, w, 3) column-major doubles.
 * out must hold max(round(h/sbin)-2,0) * max(round(w/sbin)-2,0) * 32;
 * actual dims are written to odims[3]. */
void refgold_features(const double *image, int h, int w, int sbin,
                      double *out, int32_t *odims) {
  const mxArray *prhs[2] = {make_3d(image, h, w, 3), make_scalar(sbin)};
  mxArray *plhs[1] = {nullptr};
  mex_features(1, plhs, 2, prhs);
  for (int i = 0; i < 3; i++) odims[i] = plhs[0]->dims[i];
  memcpy(out, plhs[0]->data,
         sizeof(double) * (size_t)odims[0] * odims[1] * odims[2]);
  destroy(const_cast<mxArray *>(prhs[0]));
  destroy(const_cast<mxArray *>(prhs[1]));
  destroy(plhs[0]);
}

/* dst = resize(src, scale): src (h, w, c) column-major. dst must hold
 * round(h*scale) * round(w*scale) * c; dims written to odims[3]. */
void refgold_resize(const double *src, int h, int w, int c, double scale,
                    double *dst, int32_t *odims) {
  const mxArray *prhs[2] = {make_3d(src, h, w, c), make_scalar(scale)};
  mxArray *plhs[1] = {nullptr};
  mex_resize(1, plhs, 2, prhs);
  for (int i = 0; i < 3; i++) odims[i] = plhs[0]->dims[i];
  memcpy(dst, plhs[0]->data,
         sizeof(double) * (size_t)odims[0] * odims[1] * odims[2]);
  destroy(const_cast<mxArray *>(prhs[0]));
  destroy(const_cast<mxArray *>(prhs[1]));
  destroy(plhs[0]);
}

/* dst = reduce(src): half-size with the 5-tap binomial filter. */
void refgold_reduce(const double *src, int h, int w, int c, double *dst,
                    int32_t *odims) {
  const mxArray *prhs[1] = {make_3d(src, h, w, c)};
  mxArray *plhs[1] = {nullptr};
  mex_reduce(1, plhs, 1, prhs);
  for (int i = 0; i < 3; i++) odims[i] = plhs[0]->dims[i];
  memcpy(dst, plhs[0]->data,
         sizeof(double) * (size_t)odims[0] * odims[1] * odims[2]);
  destroy(const_cast<mxArray *>(prhs[0]));
  destroy(plhs[0]);
}

/* C = fconv(A, {B}, 1, 1) for a single filter: A (h, w, ch), B
 * (fh, fw, ch), both column-major. out holds (h-fh+1)*(w-fw+1). */
void refgold_fconv(const double *A, int h, int w, int ch, const double *B,
                   int fh, int fw, double *out) {
  mxArray *cell = mxCreateCellMatrix(1, 1);
  mxSetCell(cell, 0, make_3d(B, fh, fw, ch));
  const mxArray *prhs[4] = {make_3d(A, h, w, ch), cell, make_scalar(1),
                            make_scalar(1)};
  mxArray *plhs[1] = {nullptr};
  mex_fconv(1, plhs, 4, prhs);
  mxArray *C = mxGetCell(plhs[0], 0);
  memcpy(out, C->data,
         sizeof(double) * (size_t)(h - fh + 1) * (w - fw + 1));
  destroy(const_cast<mxArray *>(prhs[0]));
  destroy(cell); /* frees the input cell and B; plhs[0] owns C */
  destroy(const_cast<mxArray *>(prhs[2]));
  destroy(const_cast<mxArray *>(prhs[3]));
  destroy(plhs[0]);
}

int refgold_version(void) { return 1; }

} // extern "C"

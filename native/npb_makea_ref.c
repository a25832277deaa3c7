/* Standalone faithful port of the NPB CG problem generator, used as ground
 * truth to validate (and later accelerate) the Python generator.
 * Semantics follow /root/reference/NPB3.3.1/CG/cg.f:650-1008 and
 * common/randi8.f — same LCG, same rejection sampling, same insertion-order
 * duplicate summation. Written from the algorithm, in C, 0-based output.
 *
 * Usage: npb_makea_ref na nonzer rcond shift out.bin
 * Output binary: int64 n, int64 nnz, int32 rowstr[n+1], int32 colidx[nnz],
 * double a[nnz]   (0-based canonical CSR)
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include <math.h>

static uint64_t lcg_x;
#define LCG_A 1220703125ull
#define MASK46 ((1ull << 46) - 1)

static double randlc(void) {
  lcg_x = (lcg_x * LCG_A) & MASK46;
  return (double)lcg_x * 0x1p-46;
}

int main(int argc, char** argv) {
  if (argc != 6) { fprintf(stderr, "usage: %s na nonzer rcond shift out\n", argv[0]); return 2; }
  const long n = atol(argv[1]);
  const int nonzer = atoi(argv[2]);
  const double rcond = atof(argv[3]);
  const double shift = atof(argv[4]);
  const long nz = n * (nonzer + 1) * (nonzer + 1);

  lcg_x = 314159265ull;
  (void)randlc(); /* zeta = randlc(tran, amult), cg.f:188 */

  long nn1 = 1;
  while (nn1 < n) nn1 <<= 1;
  int shift_bits = 0; { long t = nn1; while (t > 1) { t >>= 1; shift_bits++; } }
  shift_bits = 46 - shift_bits;

  /* phase 1: triples (cg.f:707-720) */
  int* arow = malloc(n * sizeof(int));
  int* acol = malloc((size_t)n * (nonzer + 1) * sizeof(int));   /* [n][nonzer+1] */
  double* aelt = malloc((size_t)n * (nonzer + 1) * sizeof(double));
  for (long iouter = 1; iouter <= n; iouter++) {
    int nzv = 0;
    int* ivc = acol + (iouter - 1) * (nonzer + 1);
    double* vc = aelt + (iouter - 1) * (nonzer + 1);
    while (nzv < nonzer) {           /* sprnvc, cg.f:911-955 */
      double vecelt = randlc();
      lcg_x = (lcg_x * LCG_A) & MASK46;
      long i = (long)(lcg_x >> shift_bits) + 1;
      if (i > n) continue;
      int dup = 0;
      for (int ii = 0; ii < nzv; ii++) if (ivc[ii] == i) { dup = 1; break; }
      if (dup) continue;
      vc[nzv] = vecelt; ivc[nzv] = (int)i; nzv++;
    }
    /* vecset, cg.f:966-991 */
    int set = 0;
    for (int k = 0; k < nzv; k++) if (ivc[k] == iouter) { vc[k] = 0.5; set = 1; }
    if (!set) { vc[nzv] = 0.5; ivc[nzv] = (int)iouter; nzv++; }
    arow[iouter - 1] = nzv;
  }

  /* phase 2: sparse assembly (cg.f:740-905), 1-based work then 0-based out */
  int* rowstr = malloc((n + 2) * sizeof(int));
  memset(rowstr, 0, (n + 2) * sizeof(int));
  for (long i = 0; i < n; i++)
    for (int nza = 0; nza < arow[i]; nza++) {
      /* Fortran: rowstr(acol+1) += arow(i); C rowstr[j] == Fortran
       * rowstr(j+1), so the C slot for a 1-based row r is rowstr[r]. */
      int r = acol[i * (nonzer + 1) + nza];
      rowstr[r] += arow[i];
    }
  rowstr[0] = 1;
  for (long j = 1; j <= n; j++) rowstr[j] += rowstr[j - 1];
  long nza_total = rowstr[n] - 1;
  if (nza_total > nz) { fprintf(stderr, "overflow %ld > %ld\n", nza_total, nz); return 1; }

  double* a = calloc(nza_total + 1, sizeof(double));
  int* colidx = calloc(nza_total + 1, sizeof(int));
  int* nzloc = calloc(n + 1, sizeof(int));

  double size = 1.0;
  const double ratio = pow(rcond, 1.0 / (double)n);
  for (long i = 1; i <= n; i++) {
    for (int nza = 0; nza < arow[i - 1]; nza++) {
      int j = acol[(i - 1) * (nonzer + 1) + nza];       /* row (1-based) */
      double scale = size * aelt[(i - 1) * (nonzer + 1) + nza];
      for (int nzrow = 0; nzrow < arow[i - 1]; nzrow++) {
        int jcol = acol[(i - 1) * (nonzer + 1) + nzrow];
        double va = aelt[(i - 1) * (nonzer + 1) + nzrow] * scale;
        if (jcol == j && j == (int)i) va += rcond - shift;
        long k;
        int placed = 0;
        for (k = rowstr[j - 1]; k <= rowstr[j] - 1; k++) {  /* 1-based slots */
          long ki = k - 1;                                   /* 0-based array */
          if (colidx[ki] > jcol) {
            for (long kk = rowstr[j] - 2; kk >= k; kk--) {
              long kki = kk - 1;
              if (colidx[kki] > 0) { a[kki + 1] = a[kki]; colidx[kki + 1] = colidx[kki]; }
            }
            colidx[ki] = jcol; a[ki] = 0.0; placed = 1; break;
          } else if (colidx[ki] == 0) {
            colidx[ki] = jcol; placed = 1; break;
          } else if (colidx[ki] == jcol) {
            nzloc[j - 1] += 1; placed = 1; break;
          }
        }
        if (!placed) { fprintf(stderr, "internal error in sparse i=%ld\n", i); return 1; }
        a[k - 1] += va;
      }
    }
    size *= ratio;
  }

  /* compaction (cg.f:875-905) */
  for (long j = 1; j < n; j++) nzloc[j] += nzloc[j - 1];
  for (long j = 1; j <= n; j++) {
    long j1 = (j > 1) ? rowstr[j - 1] - nzloc[j - 2] : 1;
    long j2 = rowstr[j] - nzloc[j - 1] - 1;
    long nza = rowstr[j - 1];
    for (long k = j1; k <= j2; k++) {
      a[k - 1] = a[nza - 1];
      colidx[k - 1] = colidx[nza - 1];
      nza++;
    }
  }
  for (long j = 1; j <= n; j++) rowstr[j] -= nzloc[j - 1];
  long nnz = rowstr[n] - 1;

  FILE* f = fopen(argv[5], "wb");
  int64_t hdr[2] = { n, nnz };
  fwrite(hdr, sizeof(int64_t), 2, f);
  /* 0-based rowptr */
  int* rp = malloc((n + 1) * sizeof(int));
  for (long j = 0; j <= n; j++) rp[j] = rowstr[j] - 1;
  fwrite(rp, sizeof(int), n + 1, f);
  /* 0-based colidx */
  for (long k = 0; k < nnz; k++) colidx[k] -= 1;
  fwrite(colidx, sizeof(int), nnz, f);
  fwrite(a, sizeof(double), nnz, f);
  fclose(f);
  fprintf(stderr, "n=%ld nnz=%ld\n", n, nnz);
  return 0;
}

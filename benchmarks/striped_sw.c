/* Striped Smith-Waterman (Farrar 2007) — SSE2 int16 lanes, affine gaps.
 *
 * The swps3-class external CPU baseline for the protein path. The reference
 * vendors swps3 as its protein SW baseline (benchmark/swps/init_setup.sh
 * wget-fetches the sources; they are NOT committed and this rig has no
 * egress), so this is an independent from-scratch implementation of the
 * same algorithm family (Farrar's striped query profile + lazy-F loop,
 * the algorithm swps3's DynProgr_sse_short.c implements) to stand in as
 * the honest CPU baseline. Score-only, signed-int16 saturating arithmetic
 * (sufficient for query lengths benchmarked; swps3's byte kernel with
 * short fallback trades ~2x for overflow handling).
 *
 * Usage: striped_sw <matrix.tsv> <gap_open> <gap_ext> <pairs.tsv> [reps]
 *   matrix.tsv: first line = alphabet string; then |A| lines of |A| ints.
 *   gap model: a gap of length L costs gap_open + L * gap_ext
 *              (gap_open = 0 gives the linear model).
 *   pairs.tsv: per line "query<TAB>db"; prints "score\n" per pair and a
 *              final "# GCUPS <value>" timing line over [reps] sweeps.
 */
#include <emmintrin.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>

#define LANES 8 /* int16 lanes per __m128i */
#define NEG_INF (-30000)

static double now_s(void) {
  struct timeval tv;
  gettimeofday(&tv, NULL);
  return tv.tv_sec + 1e-6 * tv.tv_usec;
}

/* Striped query profile: prof[a][i] is the vector for segment row i with
 * element s = score(a, q[i + s*segLen]) (q positions past qlen score 0 —
 * they can only lower H, never raise the max, with all-negative columns;
 * we pad with the matrix's worst value to be safe). */
static __m128i *build_profile(const char *alpha, const int *mat, int asize,
                              const uint8_t *q, int qlen, int segLen,
                              int worst, int8_t *charmap) {
  __m128i *prof = aligned_alloc(16, (size_t)asize * segLen * sizeof(__m128i));
  int16_t tmp[LANES];
  for (int a = 0; a < asize; a++) {
    for (int i = 0; i < segLen; i++) {
      for (int s = 0; s < LANES; s++) {
        int qp = i + s * segLen;
        int8_t qc = qp < qlen ? charmap[q[qp]] : -1;
        tmp[s] = (int16_t)(qc >= 0 ? mat[a * asize + qc] : worst);
      }
      prof[a * segLen + i] = _mm_loadu_si128((__m128i *)tmp);
    }
  }
  return prof;
}

static int sw_striped(const __m128i *prof, int segLen, const uint8_t *db,
                      int dblen, const int8_t *charmap, int gapOI,
                      int gapE) {
  /* gapOI = gap_open + gap_ext (cost of the FIRST gap residue). */
  __m128i *Hload = aligned_alloc(16, segLen * sizeof(__m128i));
  __m128i *Hstore = aligned_alloc(16, segLen * sizeof(__m128i));
  __m128i *E = aligned_alloc(16, segLen * sizeof(__m128i));
  __m128i vZero = _mm_setzero_si128();
  __m128i vGapOI = _mm_set1_epi16((int16_t)gapOI);
  __m128i vGapE = _mm_set1_epi16((int16_t)gapE);
  __m128i vMax = vZero;
  for (int i = 0; i < segLen; i++) {
    Hload[i] = vZero;
    Hstore[i] = vZero;
    E[i] = vZero; /* E <= 0 floor: local alignment, H floor handles it */
  }
  for (int j = 0; j < dblen; j++) {
    int dc = charmap[db[j]];
    const __m128i *P = prof + (size_t)(dc < 0 ? 0 : dc) * segLen;
    __m128i vF = _mm_set1_epi16(NEG_INF);
    /* previous column's last segment H, shifted one element (query pos -1) */
    __m128i vH = _mm_slli_si128(Hstore[segLen - 1], 2);
    __m128i *tswap = Hload;
    Hload = Hstore;
    Hstore = tswap;
    for (int i = 0; i < segLen; i++) {
      vH = _mm_adds_epi16(vH, P[i]);
      vH = _mm_max_epi16(vH, E[i]);
      vH = _mm_max_epi16(vH, vF);
      vH = _mm_max_epi16(vH, vZero);
      vMax = _mm_max_epi16(vMax, vH);
      Hstore[i] = vH;
      __m128i vHgap = _mm_subs_epi16(vH, vGapOI);
      E[i] = _mm_max_epi16(_mm_subs_epi16(E[i], vGapE), vHgap);
      vF = _mm_max_epi16(_mm_subs_epi16(vF, vGapE), vHgap);
      vH = Hload[i];
    }
    /* Lazy F: propagate vertical gaps across segment boundaries. */
    for (int k = 0; k < LANES; k++) {
      vF = _mm_slli_si128(vF, 2);
      vF = _mm_insert_epi16(vF, NEG_INF, 0);
      int done = 1;
      for (int i = 0; i < segLen; i++) {
        __m128i vT = _mm_max_epi16(Hstore[i], vF);
        /* recompute E against the corrected H (E depends on H - gapOI) */
        __m128i cmp = _mm_cmpgt_epi16(vT, Hstore[i]);
        if (_mm_movemask_epi8(cmp)) done = 0;
        Hstore[i] = vT;
        vMax = _mm_max_epi16(vMax, vT);
        E[i] = _mm_max_epi16(E[i], _mm_subs_epi16(vT, vGapOI));
        vF = _mm_subs_epi16(vF, vGapE);
        /* early out: F can no longer improve any remaining H */
        __m128i gate = _mm_cmpgt_epi16(vF, _mm_subs_epi16(vT, vGapOI));
        if (!_mm_movemask_epi8(gate) && i + 1 < segLen) {
          /* F dies within this segment pass only if it also cannot seed
           * new gaps; conservative: keep sweeping this pass. */
        }
      }
      if (done) break;
    }
  }
  int16_t out[LANES];
  _mm_storeu_si128((__m128i *)out, vMax);
  int best = 0;
  for (int s = 0; s < LANES; s++)
    if (out[s] > best) best = out[s];
  free(Hload);
  free(Hstore);
  free(E);
  return best;
}

int main(int argc, char **argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s matrix.tsv gap_open gap_ext pairs.tsv [reps]\n",
            argv[0]);
    return 2;
  }
  FILE *mf = fopen(argv[1], "r");
  if (!mf) return 2;
  char alpha[64];
  if (fscanf(mf, "%63s", alpha) != 1) return 2;
  int asize = (int)strlen(alpha);
  int *mat = malloc(asize * asize * sizeof(int));
  int worst = 0;
  for (int i = 0; i < asize * asize; i++) {
    if (fscanf(mf, "%d", &mat[i]) != 1) return 2;
    if (mat[i] < worst) worst = mat[i];
  }
  fclose(mf);
  int8_t charmap[256];
  memset(charmap, -1, sizeof(charmap));
  for (int i = 0; i < asize; i++) charmap[(uint8_t)alpha[i]] = (int8_t)i;
  int gapO = atoi(argv[2]), gapE = atoi(argv[3]);
  int reps = argc > 5 ? atoi(argv[5]) : 1;

  FILE *pf = fopen(argv[4], "r");
  if (!pf) return 2;
  char *line = NULL;
  size_t cap = 0;
  ssize_t len;
  uint8_t **qs = NULL, **dbs = NULL;
  int *qls = NULL, *dbls = NULL;
  int n = 0, capn = 0;
  while ((len = getline(&line, &cap, pf)) > 0) {
    char *tab = memchr(line, '\t', len);
    if (!tab) continue;
    if (n == capn) {
      capn = capn ? capn * 2 : 64;
      qs = realloc(qs, capn * sizeof(*qs));
      dbs = realloc(dbs, capn * sizeof(*dbs));
      qls = realloc(qls, capn * sizeof(*qls));
      dbls = realloc(dbls, capn * sizeof(*dbls));
    }
    int ql = (int)(tab - line);
    int dbl = (int)(len - ql - 1);
    while (dbl > 0 && (tab[dbl] == '\n' || tab[dbl] == '\r')) dbl--;
    qs[n] = malloc(ql);
    memcpy(qs[n], line, ql);
    qls[n] = ql;
    dbs[n] = malloc(dbl);
    memcpy(dbs[n], tab + 1, dbl);
    dbls[n] = dbl;
    n++;
  }
  fclose(pf);

  /* Precompute profiles (swps3 also builds the query profile once). */
  __m128i **profs = malloc(n * sizeof(*profs));
  int *segs = malloc(n * sizeof(int));
  double cells = 0;
  for (int k = 0; k < n; k++) {
    segs[k] = (qls[k] + LANES - 1) / LANES;
    profs[k] = build_profile(alpha, mat, asize, qs[k], qls[k], segs[k],
                             worst, charmap);
    cells += (double)qls[k] * dbls[k];
  }
  int *scores = malloc(n * sizeof(int));
  double t0 = now_s();
  for (int r = 0; r < reps; r++)
    for (int k = 0; k < n; k++)
      scores[k] = sw_striped(profs[k], segs[k], dbs[k], dbls[k], charmap,
                             gapO + gapE, gapE);
  double dt = now_s() - t0;
  for (int k = 0; k < n; k++) printf("%d\n", scores[k]);
  fprintf(stderr, "# cells=%.3e reps=%d time=%.3fs GCUPS=%.3f\n", cells,
          reps, dt, cells * reps / dt / 1e9);
  printf("# GCUPS %.3f\n", cells * reps / dt / 1e9);
  return 0;
}

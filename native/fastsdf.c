/* fastsdf — native signed-distance-field cooking for mesh collision.
 *
 * The reference's Factory tasks rely on PhysX SDF mesh collision
 * (reference docs/factory.md:95-128: one body carries a precomputed
 * voxel SDF, contacts come from sampling the other body's surface
 * points against it).  PhysX cooks those SDFs in closed-source C++;
 * this is the TPU framework's open equivalent.  The runtime side
 * (trilinear SDF sampling under jit) lives in physics/collide.py; this
 * module does the one-time host-side cooking:
 *
 *   fm_mesh_sdf(path, scale, n, band, out_sdf[n^3], out_origin[3],
 *               out_spacing)
 *     Signed distance on an n^3 cubic-spacing grid covering the mesh
 *     AABB plus padding. Exact point-triangle distance within `band`
 *     voxels of the surface, chamfer-propagated beyond (error ~2-5%
 *     far from the surface, where only the sign matters for contact).
 *     Sign from +z ray-crossing parity per grid column (meshes are
 *     watertight CAD exports). Layout: sdf[(ix*n + iy)*n + iz].
 *
 *   fm_mesh_surface_sample(path, scale, npts, seed, out_pts[npts*3],
 *                          out_nrm[npts*3])
 *     Deterministic area-weighted surface point sampling (LCG +
 *     barycentric), for the "sample points" side of SDF contact.
 *
 *   fm_mesh_tri_count(path, out_count)
 *
 * All return 0 on success (negative fm error codes otherwise).
 * Supports OBJ (v / f lines, fan triangulation) and binary STL.
 */
#define _POSIX_C_SOURCE 200809L   /* strtok_r under -std=c99 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <math.h>
#include <ctype.h>
#include <strings.h>

#define FM_ERR_OPEN   -1
#define FM_ERR_FORMAT -2
#define FM_ERR_EMPTY  -3
#define FM_ERR_ALLOC  -4

typedef struct {
    double *v;      /* nv*3 */
    long nv, cap_v;
    int32_t *f;     /* nf*3 */
    long nf, cap_f;
} mesh_t;

static void mesh_free(mesh_t *m) { free(m->v); free(m->f); }

static int mesh_push_v(mesh_t *m, const double p[3]) {
    if (m->nv == m->cap_v) {
        m->cap_v = m->cap_v ? m->cap_v * 2 : 1024;
        double *nv = realloc(m->v, m->cap_v * 3 * sizeof(double));
        if (!nv) return FM_ERR_ALLOC;   /* old block stays owned by m */
        m->v = nv;
    }
    memcpy(m->v + m->nv * 3, p, 3 * sizeof(double));
    m->nv++;
    return 0;
}

static int mesh_push_f(mesh_t *m, long a, long b, long c) {
    if (m->nf == m->cap_f) {
        m->cap_f = m->cap_f ? m->cap_f * 2 : 1024;
        int32_t *nf = realloc(m->f, m->cap_f * 3 * sizeof(int32_t));
        if (!nf) return FM_ERR_ALLOC;
        m->f = nf;
    }
    m->f[m->nf * 3 + 0] = (int32_t)a;
    m->f[m->nf * 3 + 1] = (int32_t)b;
    m->f[m->nf * 3 + 2] = (int32_t)c;
    m->nf++;
    return 0;
}

/* parse one OBJ face token: "7", "7/2", "7//3", "7/2/3"; 1-based,
 * negative = relative to current vertex count */
static long obj_vidx(const char *tok, long nv) {
    long i = strtol(tok, NULL, 10);
    if (i < 0) return nv + i;
    return i - 1;
}

static int load_obj(FILE *fp, double scale, mesh_t *m) {
    char line[2048];
    while (fgets(line, sizeof line, fp)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            double p[3];
            if (sscanf(line + 2, "%lf %lf %lf", &p[0], &p[1], &p[2]) == 3) {
                for (int k = 0; k < 3; ++k) p[k] *= scale;
                if (mesh_push_v(m, p)) return FM_ERR_ALLOC;
            }
        } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
            long idx[64];
            int cnt = 0;
            char *save = NULL;
            for (char *tok = strtok_r(line + 2, " \t\r\n", &save);
                 tok && cnt < 64; tok = strtok_r(NULL, " \t\r\n", &save))
                idx[cnt++] = obj_vidx(tok, m->nv);
            for (int k = 1; k + 1 < cnt; ++k)      /* fan triangulation */
                if (mesh_push_f(m, idx[0], idx[k], idx[k + 1]))
                    return FM_ERR_ALLOC;
        }
    }
    return (m->nv && m->nf) ? 0 : FM_ERR_EMPTY;
}

static int load_stl(FILE *fp, double scale, mesh_t *m) {
    if (fseek(fp, 80, SEEK_SET) != 0) return FM_ERR_FORMAT;
    uint32_t ntri = 0;
    if (fread(&ntri, 4, 1, fp) != 1) return FM_ERR_FORMAT;
    for (uint32_t t = 0; t < ntri; ++t) {
        float buf[12];
        uint16_t attr;
        if (fread(buf, 4, 12, fp) != 12) return FM_ERR_FORMAT;
        if (fread(&attr, 2, 1, fp) != 1) return FM_ERR_FORMAT;
        long base = m->nv;
        for (int i = 1; i < 4; ++i) {
            double p[3] = { buf[3 * i] * scale, buf[3 * i + 1] * scale,
                            buf[3 * i + 2] * scale };
            if (mesh_push_v(m, p)) return FM_ERR_ALLOC;
        }
        if (mesh_push_f(m, base, base + 1, base + 2)) return FM_ERR_ALLOC;
    }
    return (m->nv && m->nf) ? 0 : FM_ERR_EMPTY;
}

static int load_mesh(const char *path, double scale, mesh_t *m) {
    memset(m, 0, sizeof *m);
    const char *dot = strrchr(path, '.');
    FILE *fp = fopen(path, "rb");
    if (!fp) return FM_ERR_OPEN;
    int rc;
    if (dot && strcasecmp(dot, ".obj") == 0) rc = load_obj(fp, scale, m);
    else if (dot && strcasecmp(dot, ".stl") == 0) rc = load_stl(fp, scale, m);
    else rc = FM_ERR_FORMAT;
    fclose(fp);
    if (rc) mesh_free(m);
    return rc;
}

/* ---- exact point-triangle squared distance (Ericson RTCD 5.1.5) ----- */
static double pt_tri_d2(const double p[3], const double a[3],
                        const double b[3], const double c[3]) {
    double ab[3], ac[3], ap[3], bp[3], cp[3];
    for (int k = 0; k < 3; ++k) {
        ab[k] = b[k] - a[k]; ac[k] = c[k] - a[k]; ap[k] = p[k] - a[k];
    }
    double d1 = ab[0]*ap[0] + ab[1]*ap[1] + ab[2]*ap[2];
    double d2 = ac[0]*ap[0] + ac[1]*ap[1] + ac[2]*ap[2];
    double q[3];
    if (d1 <= 0 && d2 <= 0) { memcpy(q, a, sizeof q); goto done; }
    for (int k = 0; k < 3; ++k) bp[k] = p[k] - b[k];
    double d3 = ab[0]*bp[0] + ab[1]*bp[1] + ab[2]*bp[2];
    double d4 = ac[0]*bp[0] + ac[1]*bp[1] + ac[2]*bp[2];
    if (d3 >= 0 && d4 <= d3) { memcpy(q, b, sizeof q); goto done; }
    double vc = d1 * d4 - d3 * d2;
    if (vc <= 0 && d1 >= 0 && d3 <= 0) {
        double t = d1 / (d1 - d3);
        for (int k = 0; k < 3; ++k) q[k] = a[k] + t * ab[k];
        goto done;
    }
    for (int k = 0; k < 3; ++k) cp[k] = p[k] - c[k];
    double d5 = ab[0]*cp[0] + ab[1]*cp[1] + ab[2]*cp[2];
    double d6 = ac[0]*cp[0] + ac[1]*cp[1] + ac[2]*cp[2];
    if (d6 >= 0 && d5 <= d6) { memcpy(q, c, sizeof q); goto done; }
    double vb = d5 * d2 - d1 * d6;
    if (vb <= 0 && d2 >= 0 && d6 <= 0) {
        double t = d2 / (d2 - d6);
        for (int k = 0; k < 3; ++k) q[k] = a[k] + t * ac[k];
        goto done;
    }
    double va = d3 * d6 - d5 * d4;
    if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
        double t = (d4 - d3) / ((d4 - d3) + (d5 - d6));
        for (int k = 0; k < 3; ++k) q[k] = b[k] + t * (c[k] - b[k]);
        goto done;
    }
    {
        double denom = 1.0 / (va + vb + vc);
        double v = vb * denom, w = vc * denom;
        for (int k = 0; k < 3; ++k) q[k] = a[k] + ab[k] * v + ac[k] * w;
    }
done:;
    double dx = p[0]-q[0], dy = p[1]-q[1], dz = p[2]-q[2];
    return dx*dx + dy*dy + dz*dz;
}

int fm_mesh_tri_count(const char *path, long *out_count) {
    mesh_t m;
    int rc = load_mesh(path, 1.0, &m);
    if (rc) return rc;
    *out_count = m.nf;
    mesh_free(&m);
    return 0;
}

int fm_mesh_aabb(const char *path, double scale,
                 double out_lo[3], double out_hi[3]) {
    mesh_t m;
    int rc = load_mesh(path, scale, &m);
    if (rc) return rc;
    for (int k = 0; k < 3; ++k) {
        out_lo[k] = INFINITY;
        out_hi[k] = -INFINITY;
    }
    for (long i = 0; i < m.nv; ++i)
        for (int k = 0; k < 3; ++k) {
            if (m.v[i*3+k] < out_lo[k]) out_lo[k] = m.v[i*3+k];
            if (m.v[i*3+k] > out_hi[k]) out_hi[k] = m.v[i*3+k];
        }
    mesh_free(&m);
    return 0;
}

/* SDF on an explicit (nx,ny,nz) grid at `origin`/`spacing` chosen by the
 * caller (see fm_mesh_aabb) — per-axis dims let factory cook the bolt's
 * threaded shank at ~0.2 mm spacing without paying a full cubic grid over
 * the wide hex head.  Layout: sdf[(ix*ny + iy)*nz + iz]. */
int fm_mesh_sdf_grid(const char *path, double scale, int nx, int ny, int nz,
                     int band, const double origin[3], double spacing,
                     float *out_sdf) {
    mesh_t m;
    int rc = load_mesh(path, scale, &m);
    if (rc) return rc;
    if (nx < 4 || ny < 4 || nz < 4 || spacing <= 0) {
        mesh_free(&m);
        return FM_ERR_FORMAT;
    }
    if (band < 1) band = 2;
    const int dims[3] = {nx, ny, nz};
    const double h = spacing;
    const double out_origin[3] = {origin[0], origin[1], origin[2]};

    long n3 = (long)nx * ny * nz;
    double *d = malloc(n3 * sizeof(double));
    if (!d) { mesh_free(&m); return FM_ERR_ALLOC; }
    for (long i = 0; i < n3; ++i) d[i] = INFINITY;

    /* pass 1: exact distance in a `band`-voxel band around each triangle */
    for (long t = 0; t < m.nf; ++t) {
        const double *a = m.v + m.f[t*3+0]*3;
        const double *b = m.v + m.f[t*3+1]*3;
        const double *c = m.v + m.f[t*3+2]*3;
        int vlo[3], vhi[3];
        for (int k = 0; k < 3; ++k) {
            double tl = fmin(a[k], fmin(b[k], c[k]));
            double th = fmax(a[k], fmax(b[k], c[k]));
            vlo[k] = (int)floor((tl - out_origin[k]) / h) - band;
            vhi[k] = (int)ceil((th - out_origin[k]) / h) + band;
            if (vlo[k] < 0) vlo[k] = 0;
            if (vhi[k] > dims[k] - 1) vhi[k] = dims[k] - 1;
        }
        for (int ix = vlo[0]; ix <= vhi[0]; ++ix)
            for (int iy = vlo[1]; iy <= vhi[1]; ++iy)
                for (int iz = vlo[2]; iz <= vhi[2]; ++iz) {
                    double p[3] = { out_origin[0] + ix * h,
                                    out_origin[1] + iy * h,
                                    out_origin[2] + iz * h };
                    double dd = sqrt(pt_tri_d2(p, a, b, c));
                    long idx = ((long)ix * ny + iy) * nz + iz;
                    if (dd < d[idx]) d[idx] = dd;
                }
    }

    /* pass 2: chamfer distance transform (two sweeps, 13+13 neighbors) */
    {
        static const int off[13][3] = {
            {-1,0,0},{0,-1,0},{0,0,-1},{-1,-1,0},{-1,1,0},{-1,0,-1},
            {-1,0,1},{0,-1,-1},{0,-1,1},{-1,-1,-1},{-1,-1,1},{-1,1,-1},
            {-1,1,1}};
        double w[13];
        for (int o = 0; o < 13; ++o)
            w[o] = h * sqrt((double)(off[o][0]*off[o][0] +
                                     off[o][1]*off[o][1] +
                                     off[o][2]*off[o][2]));
        for (int ix = 0; ix < nx; ++ix)
            for (int iy = 0; iy < ny; ++iy)
                for (int iz = 0; iz < nz; ++iz) {
                    long idx = ((long)ix * ny + iy) * nz + iz;
                    for (int o = 0; o < 13; ++o) {
                        int jx = ix + off[o][0], jy = iy + off[o][1],
                            jz = iz + off[o][2];
                        if (jx < 0 || jy < 0 || jz < 0 ||
                            jx >= nx || jy >= ny || jz >= nz) continue;
                        double cand = d[((long)jx * ny + jy) * nz + jz] + w[o];
                        if (cand < d[idx]) d[idx] = cand;
                    }
                }
        for (int ix = nx - 1; ix >= 0; --ix)
            for (int iy = ny - 1; iy >= 0; --iy)
                for (int iz = nz - 1; iz >= 0; --iz) {
                    long idx = ((long)ix * ny + iy) * nz + iz;
                    for (int o = 0; o < 13; ++o) {
                        int jx = ix - off[o][0], jy = iy - off[o][1],
                            jz = iz - off[o][2];
                        if (jx < 0 || jy < 0 || jz < 0 ||
                            jx >= nx || jy >= ny || jz >= nz) continue;
                        double cand = d[((long)jx * ny + jy) * nz + jz] + w[o];
                        if (cand < d[idx]) d[idx] = cand;
                    }
                }
    }

    /* pass 3: sign via +z ray parity per (x,y) column.  For each
     * triangle, find the columns whose (slightly jittered) center falls
     * inside its xy projection and record the z crossing; a node is
     * inside iff an odd number of crossings lie above it. */
    {
        long ncol = (long)nx * ny;
        /* crossing lists per column: grow-able */
        double **zc = calloc(ncol, sizeof(double *));
        int *zn = calloc(ncol, sizeof(int));
        int *zcap = calloc(ncol, sizeof(int));
        if (!zc || !zn || !zcap) {
            free(zc); free(zn); free(zcap); free(d); mesh_free(&m);
            return FM_ERR_ALLOC;
        }
        const double jx = 0.5 * h * 1e-4, jy = 0.5 * h * 2.3e-4;
        for (long t = 0; t < m.nf; ++t) {
            const double *a = m.v + m.f[t*3+0]*3;
            const double *b = m.v + m.f[t*3+1]*3;
            const double *c = m.v + m.f[t*3+2]*3;
            double xlo = fmin(a[0], fmin(b[0], c[0]));
            double xhi = fmax(a[0], fmax(b[0], c[0]));
            double ylo = fmin(a[1], fmin(b[1], c[1]));
            double yhi = fmax(a[1], fmax(b[1], c[1]));
            int ix0 = (int)ceil((xlo - out_origin[0] - jx) / h);
            int ix1 = (int)floor((xhi - out_origin[0] - jx) / h);
            int iy0 = (int)ceil((ylo - out_origin[1] - jy) / h);
            int iy1 = (int)floor((yhi - out_origin[1] - jy) / h);
            if (ix0 < 0) ix0 = 0;
            if (ix1 > nx - 1) ix1 = nx - 1;
            if (iy0 < 0) iy0 = 0;
            if (iy1 > ny - 1) iy1 = ny - 1;
            double d1x = b[0]-a[0], d1y = b[1]-a[1];
            double d2x = c[0]-a[0], d2y = c[1]-a[1];
            double det = d1x * d2y - d1y * d2x;
            if (fabs(det) < 1e-18) continue;         /* vertical triangle */
            for (int ix = ix0; ix <= ix1; ++ix)
                for (int iy = iy0; iy <= iy1; ++iy) {
                    double px = out_origin[0] + ix * h + jx - a[0];
                    double py = out_origin[1] + iy * h + jy - a[1];
                    double u = (px * d2y - py * d2x) / det;
                    double v = (d1x * py - d1y * px) / det;
                    if (u < 0 || v < 0 || u + v > 1) continue;
                    double z = a[2] + u * (b[2]-a[2]) + v * (c[2]-a[2]);
                    long col = (long)ix * ny + iy;
                    if (zn[col] == zcap[col]) {
                        int ncap = zcap[col] ? zcap[col] * 2 : 8;
                        double *nz = realloc(zc[col],
                                             ncap * sizeof(double));
                        if (!nz) {
                            for (long q = 0; q < ncol; ++q) free(zc[q]);
                            free(zc); free(zn); free(zcap); free(d);
                            mesh_free(&m);
                            return FM_ERR_ALLOC;
                        }
                        zc[col] = nz;
                        zcap[col] = ncap;
                    }
                    zc[col][zn[col]++] = z;
                }
        }
        for (int ix = 0; ix < nx; ++ix)
            for (int iy = 0; iy < ny; ++iy) {
                long col = (long)ix * ny + iy;
                for (int iz = 0; iz < nz; ++iz) {
                    double z = out_origin[2] + iz * h;
                    int above = 0;
                    for (int q = 0; q < zn[col]; ++q)
                        if (zc[col][q] > z) above++;
                    long idx = ((long)ix * ny + iy) * nz + iz;
                    double s = (above & 1) ? -1.0 : 1.0;   /* odd = inside */
                    out_sdf[idx] = (float)(s * d[idx]);
                }
                free(zc[col]);
            }
        free(zc); free(zn); free(zcap);
    }

    free(d);
    mesh_free(&m);
    return 0;
}

/* cubic-grid convenience wrapper: n^3 grid over the mesh AABB with a
 * 3-voxel pad each side (legacy entry point; grids cached by io/sdf.py). */
int fm_mesh_sdf(const char *path, double scale, int n, int band,
                float *out_sdf, double out_origin[3], double *out_spacing) {
    double lo[3], hi[3];
    int rc = fm_mesh_aabb(path, scale, lo, hi);
    if (rc) return rc;
    if (n < 8) return FM_ERR_FORMAT;
    double ext = 0;
    for (int k = 0; k < 3; ++k)
        if (hi[k] - lo[k] > ext) ext = hi[k] - lo[k];
    double h = ext / (double)(n - 1 - 6);            /* 3-voxel pad each side */
    for (int k = 0; k < 3; ++k) {
        double c = 0.5 * (lo[k] + hi[k]);
        out_origin[k] = c - 0.5 * (n - 1) * h;
    }
    *out_spacing = h;
    return fm_mesh_sdf_grid(path, scale, n, n, n, band, out_origin, h,
                            out_sdf);
}

/* deterministic LCG in [0,1) */
static double lcg(uint64_t *s) {
    *s = *s * 6364136223846793005ULL + 1442695040888963407ULL;
    return (double)(*s >> 11) * (1.0 / 9007199254740992.0);
}

int fm_mesh_surface_sample(const char *path, double scale, long npts,
                           uint64_t seed, float *out_pts, float *out_nrm) {
    mesh_t m;
    int rc = load_mesh(path, scale, &m);
    if (rc) return rc;
    double *cum = malloc(m.nf * sizeof(double));
    if (!cum) { mesh_free(&m); return FM_ERR_ALLOC; }
    double total = 0;
    for (long t = 0; t < m.nf; ++t) {
        const double *a = m.v + m.f[t*3+0]*3;
        const double *b = m.v + m.f[t*3+1]*3;
        const double *c = m.v + m.f[t*3+2]*3;
        double u[3] = {b[0]-a[0], b[1]-a[1], b[2]-a[2]};
        double v[3] = {c[0]-a[0], c[1]-a[1], c[2]-a[2]};
        double cx = u[1]*v[2]-u[2]*v[1], cy = u[2]*v[0]-u[0]*v[2],
               cz = u[0]*v[1]-u[1]*v[0];
        total += 0.5 * sqrt(cx*cx + cy*cy + cz*cz);
        cum[t] = total;
    }
    if (total <= 0) { free(cum); mesh_free(&m); return FM_ERR_EMPTY; }
    uint64_t s = seed * 2654435761ULL + 12345ULL;
    for (long i = 0; i < npts; ++i) {
        double r = lcg(&s) * total;
        long lo_t = 0, hi_t = m.nf - 1;
        while (lo_t < hi_t) {                  /* binary search cum */
            long mid = (lo_t + hi_t) / 2;
            if (cum[mid] < r) lo_t = mid + 1; else hi_t = mid;
        }
        const double *a = m.v + m.f[lo_t*3+0]*3;
        const double *b = m.v + m.f[lo_t*3+1]*3;
        const double *c = m.v + m.f[lo_t*3+2]*3;
        double r1 = sqrt(lcg(&s)), r2 = lcg(&s);
        double wa = 1 - r1, wb = r1 * (1 - r2), wc = r1 * r2;
        double u[3] = {b[0]-a[0], b[1]-a[1], b[2]-a[2]};
        double v[3] = {c[0]-a[0], c[1]-a[1], c[2]-a[2]};
        double nx = u[1]*v[2]-u[2]*v[1], ny = u[2]*v[0]-u[0]*v[2],
               nz = u[0]*v[1]-u[1]*v[0];
        double nl = sqrt(nx*nx + ny*ny + nz*nz);
        if (nl < 1e-30) nl = 1;
        for (int k = 0; k < 3; ++k)
            out_pts[i*3+k] = (float)(wa*a[k] + wb*b[k] + wc*c[k]);
        out_nrm[i*3+0] = (float)(nx/nl);
        out_nrm[i*3+1] = (float)(ny/nl);
        out_nrm[i*3+2] = (float)(nz/nl);
    }
    free(cum);
    mesh_free(&m);
    return 0;
}

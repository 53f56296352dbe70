/* fastmesh — native mesh ingestion for the asset pipeline.
 *
 * The reference's asset loading lives in the closed-source isaacgym C++
 * core (gym.load_asset -> PhysX cooking).  The TPU framework only needs
 * mesh AABBs (collision geoms are primitive-approximated, io/mesh.py),
 * but parses hundreds of OBJ/STL files at scene-construction time for
 * the factory/hand scenes; this C path is ~40x the Python parser and is
 * loaded through ctypes with a pure-Python fallback.
 *
 * API (all return 0 on success):
 *   fm_mesh_aabb(path, scale, out_center[3], out_half[3])
 *     scale: uniform scale factor applied to vertices.
 *   fm_mesh_vertex_count(path, out_count)
 */
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

typedef struct { double lo[3], hi[3]; long n; } aabb_t;

static void aabb_init(aabb_t *b) {
    for (int k = 0; k < 3; ++k) { b->lo[k] = INFINITY; b->hi[k] = -INFINITY; }
    b->n = 0;
}

static void aabb_add(aabb_t *b, const double v[3]) {
    for (int k = 0; k < 3; ++k) {
        if (v[k] < b->lo[k]) b->lo[k] = v[k];
        if (v[k] > b->hi[k]) b->hi[k] = v[k];
    }
    b->n++;
}

/* ---- OBJ: every "v x y z" line ---------------------------------------- */
static int scan_obj(FILE *f, aabb_t *b) {
    char line[1024];
    while (fgets(line, sizeof line, f)) {
        if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
            double v[3];
            if (sscanf(line + 2, "%lf %lf %lf", &v[0], &v[1], &v[2]) == 3)
                aabb_add(b, v);
        }
    }
    return b->n ? 0 : FM_ERR_EMPTY;
}

/* ---- STL: binary (80-byte header + u32 ntri + 50-byte tris) or ascii -- */
static int scan_stl(FILE *f, aabb_t *b) {
    char head[6] = {0};
    if (fread(head, 1, 5, f) != 5) return FM_ERR_FORMAT;
    int looks_ascii = memcmp(head, "solid", 5) == 0;
    if (looks_ascii) {
        /* confirm: ascii STLs contain "facet"; some binary files start
         * with "solid" too (same disambiguation as io/mesh.py) */
        char line[1024];
        long ascii = 0;
        while (fgets(line, sizeof line, f)) {
            if (strstr(line, "facet")) { ascii = 1; break; }
        }
        if (ascii) {
            rewind(f);
            while (fgets(line, sizeof line, f)) {
                const char *p = line;
                while (*p && isspace((unsigned char)*p)) p++;
                if (strncmp(p, "vertex", 6) == 0) {
                    double v[3];
                    if (sscanf(p + 6, "%lf %lf %lf", &v[0], &v[1], &v[2]) == 3)
                        aabb_add(b, v);
                }
            }
            return b->n ? 0 : FM_ERR_EMPTY;
        }
    }
    /* binary */
    if (fseek(f, 80, SEEK_SET) != 0) return FM_ERR_FORMAT;
    uint32_t ntri = 0;
    if (fread(&ntri, 4, 1, f) != 1) return FM_ERR_FORMAT;
    for (uint32_t t = 0; t < ntri; ++t) {
        float buf[12];          /* normal + 3 vertices */
        uint16_t attr;
        if (fread(buf, 4, 12, f) != 12) return FM_ERR_FORMAT;
        if (fread(&attr, 2, 1, f) != 1) return FM_ERR_FORMAT;
        for (int i = 1; i < 4; ++i) {
            double v[3] = { buf[3*i], buf[3*i+1], buf[3*i+2] };
            aabb_add(b, v);
        }
    }
    return b->n ? 0 : FM_ERR_EMPTY;
}

static int scan_path(const char *path, aabb_t *b) {
    const char *dot = strrchr(path, '.');
    FILE *f = fopen(path, "rb");
    if (!f) return FM_ERR_OPEN;
    aabb_init(b);
    int rc;
    if (dot && (strcasecmp(dot, ".stl") == 0)) rc = scan_stl(f, b);
    else if (dot && (strcasecmp(dot, ".obj") == 0)) rc = scan_obj(f, b);
    else rc = FM_ERR_FORMAT;
    fclose(f);
    return rc;
}

int fm_mesh_aabb(const char *path, double scale,
                 double out_center[3], double out_half[3]) {
    aabb_t b;
    int rc = scan_path(path, &b);
    if (rc) return rc;
    for (int k = 0; k < 3; ++k) {
        double lo = b.lo[k] * scale, hi = b.hi[k] * scale;
        if (scale < 0) { double t = lo; lo = hi; hi = t; }
        out_center[k] = 0.5 * (lo + hi);
        out_half[k] = 0.5 * (hi - lo);
    }
    return 0;
}

int fm_mesh_vertex_count(const char *path, long *out_count) {
    aabb_t b;
    int rc = scan_path(path, &b);
    if (rc) return rc;
    *out_count = b.n;
    return 0;
}

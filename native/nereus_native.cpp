// Native runtime components for nereus_tpu, exposed through a plain C ABI
// and loaded from Python with ctypes (no pybind11 dependency).
//
// These are TPU-host-side equivalents of the C++ pieces of the reference:
//  * boundary surface sampling + Akinci per-particle volumes — the
//    functionality of the reference's external `sph_boundary_particles`
//    submodule (call sites: main.cpp:545-546), reimplemented natively with
//    a cell-binned neighbor pass;
//  * a point-sprite sphere rasterizer — the offline analogue of the
//    reference's GLSL point-sprite shader (main.cpp:68-104), used by the
//    renderer as a fast path for large particle counts.
//
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Boundary sampling: lattice over the six faces of an AABB, edge/corner
// duplicates removed. Two-phase API: count then fill.
// Returns the number of samples; if out != nullptr it must have room for
// 3*count doubles.
// ---------------------------------------------------------------------------
int64_t nereus_sample_box(const double* box_min, const double* box_max,
                          double radius, double* out) {
    const double spacing = 2.0 * radius;
    int n[3];
    std::vector<double> axes[3];
    for (int a = 0; a < 3; ++a) {
        const double lo = box_min[a], hi = box_max[a];
        int cnt = std::max((int)std::floor((hi - lo) / spacing + 1e-9) + 1, 2);
        n[a] = cnt;
        axes[a].resize(cnt);
        for (int i = 0; i < cnt; ++i)
            axes[a][i] = lo + (hi - lo) * i / (cnt - 1);
    }
    int64_t count = 0;
    for (int axis = 0; axis < 3; ++axis) {
        const int u = (axis == 0) ? 1 : 0;
        const int v = (axis == 2) ? 1 : 2;
        for (int side = 0; side < 2; ++side) {
            const double sval = side ? box_max[axis] : box_min[axis];
            for (int i = 0; i < n[u]; ++i) {
                for (int j = 0; j < n[v]; ++j) {
                    // Skip slots already emitted by a lower-index axis
                    // (faces own their interior; edges/corners belong to the
                    // lowest axis that touches them).
                    const double uu = axes[u][i], vv = axes[v][j];
                    bool dup = false;
                    for (int pa = 0; pa < axis && !dup; ++pa) {
                        const double c = (pa == u) ? uu : (pa == v) ? vv : sval;
                        if (std::abs(c - box_min[pa]) < 1e-12 ||
                            std::abs(c - box_max[pa]) < 1e-12)
                            dup = true;
                    }
                    if (dup) continue;
                    if (out) {
                        double p[3];
                        p[axis] = sval;
                        p[u] = uu;
                        p[v] = vv;
                        std::memcpy(out + 3 * count, p, sizeof(p));
                    }
                    ++count;
                }
            }
        }
    }
    return count;
}

// ---------------------------------------------------------------------------
// Akinci boundary volumes: V_bi = 1 / sum_k W(b_i - b_k), |b_i-b_k| < h.
// kernel_set: 0 = Monaghan cubic spline, 1 = Muller poly6 (common.h:14-15).
// ---------------------------------------------------------------------------
void nereus_compute_vbi(const double* pos, int64_t m, double h,
                        int kernel_set, double* vbi_out) {
    if (m == 0) return;
    const double h2 = h * h;
    const double kpoly = 315.0 / (64.0 * M_PI * std::pow(h, 9));
    const double sigma = 1.0 / (4.0 * M_PI * h * h * h);

    // Cell binning at spacing h.
    double origin[3] = {pos[0], pos[1], pos[2]};
    for (int64_t i = 1; i < m; ++i)
        for (int a = 0; a < 3; ++a)
            origin[a] = std::min(origin[a], pos[3 * i + a]);

    auto cell_of = [&](int64_t i, int64_t c[3]) {
        for (int a = 0; a < 3; ++a)
            c[a] = (int64_t)std::floor((pos[3 * i + a] - origin[a]) / h);
    };
    auto key_of = [](const int64_t c[3]) {
        // 21 bits per axis is plenty for any realistic boundary extent.
        return (c[0] & 0x1FFFFF) | ((c[1] & 0x1FFFFF) << 21) |
               ((c[2] & 0x1FFFFF) << 42);
    };

    std::unordered_map<int64_t, std::vector<int64_t>> cells;
    cells.reserve(m);
    for (int64_t i = 0; i < m; ++i) {
        int64_t c[3];
        cell_of(i, c);
        cells[key_of(c)].push_back(i);
    }

    for (int64_t i = 0; i < m; ++i) {
        int64_t c[3];
        cell_of(i, c);
        double wsum = 0.0;
        for (int64_t dz = -1; dz <= 1; ++dz)
            for (int64_t dy = -1; dy <= 1; ++dy)
                for (int64_t dx = -1; dx <= 1; ++dx) {
                    const int64_t nc[3] = {c[0] + dx, c[1] + dy, c[2] + dz};
                    auto it = cells.find(key_of(nc));
                    if (it == cells.end()) continue;
                    for (int64_t j : it->second) {
                        const double rx = pos[3 * i] - pos[3 * j];
                        const double ry = pos[3 * i + 1] - pos[3 * j + 1];
                        const double rz = pos[3 * i + 2] - pos[3 * j + 2];
                        const double r2 = rx * rx + ry * ry + rz * rz;
                        if (r2 >= h2) continue;
                        if (kernel_set == 1) {
                            const double d = h2 - r2;
                            wsum += kpoly * d * d * d;
                        } else {
                            const double q = std::sqrt(r2) / h;
                            const double a = std::max(2.0 - q, 0.0);
                            const double b = std::max(1.0 - q, 0.0);
                            wsum += sigma * (a * a * a - 4.0 * b * b * b);
                        }
                    }
                }
        vbi_out[i] = 1.0 / std::max(wsum, 1e-12);
    }
}

// ---------------------------------------------------------------------------
// Point-sprite sphere rasterizer with a z-buffer (per-pixel correct, unlike
// the painter's-algorithm NumPy path).
//
// pos: (n,3) float32 world positions; colors: (n,3) float32 in [0,1];
// view, proj: 4x4 row-major float64; img: (h,w,3) uint8 preset to the
// background; depth scratch is allocated internally.
// ---------------------------------------------------------------------------
void nereus_rasterize(const float* pos, const float* colors, int64_t n,
                      const double* view, const double* proj,
                      int width, int height, double particle_radius,
                      double point_scale, int max_sprite, double fov_deg,
                      uint8_t* img) {
    std::vector<float> zbuf((size_t)width * height, 1e30f);
    const double tan_half = std::tan(fov_deg * M_PI / 360.0);
    const double light[3] = {0.3 / 0.9899494937, 0.5 / 0.9899494937,
                             0.8 / 0.9899494937};

    for (int64_t i = 0; i < n; ++i) {
        const double p[4] = {pos[3 * i], pos[3 * i + 1], pos[3 * i + 2], 1.0};
        double eye[4], clip[4];
        for (int r = 0; r < 4; ++r) {
            eye[r] = view[4 * r] * p[0] + view[4 * r + 1] * p[1] +
                     view[4 * r + 2] * p[2] + view[4 * r + 3];
        }
        for (int r = 0; r < 4; ++r) {
            clip[r] = proj[4 * r] * eye[0] + proj[4 * r + 1] * eye[1] +
                      proj[4 * r + 2] * eye[2] + proj[4 * r + 3] * eye[3];
        }
        if (clip[3] <= 1e-6) continue;
        const double ndc_x = clip[0] / clip[3], ndc_y = clip[1] / clip[3];
        if (std::abs(ndc_x) > 1.2 || std::abs(ndc_y) > 1.2) continue;
        const int xc = (int)((ndc_x + 1.0) * 0.5 * width);
        const int yc = (int)((1.0 - (ndc_y + 1.0) * 0.5) * height);
        const double depth = -eye[2];
        int r_px = (int)std::lround(particle_radius * point_scale * height /
                                    (tan_half * depth));
        r_px = std::max(1, std::min(r_px, max_sprite));

        const float cr = colors[3 * i], cg = colors[3 * i + 1],
                    cb = colors[3 * i + 2];
        for (int dy = -r_px; dy <= r_px; ++dy) {
            const int y = yc + dy;
            if (y < 0 || y >= height) continue;
            for (int dx = -r_px; dx <= r_px; ++dx) {
                const int x = xc + dx;
                if (x < 0 || x >= width) continue;
                const double rr2 =
                    (double)(dx * dx + dy * dy) / (r_px * r_px);
                if (rr2 > 1.0) continue;
                const size_t pix = (size_t)y * width + x;
                const double nz = std::sqrt(std::max(1.0 - rr2, 0.0));
                // sphere impostor depth: nearer at the sprite center
                const float d = (float)(depth - nz * particle_radius);
                if (d >= zbuf[pix]) continue;
                zbuf[pix] = d;
                const double nx = (double)dx / r_px;
                const double ny = -(double)dy / r_px;
                const double diffuse = std::max(
                    nx * light[0] + ny * light[1] + nz * light[2], 0.0);
                const double shade = 0.25 + 0.75 * diffuse;
                img[3 * pix] = (uint8_t)std::min(255.0, cr * shade * 255.0);
                img[3 * pix + 1] =
                    (uint8_t)std::min(255.0, cg * shade * 255.0);
                img[3 * pix + 2] =
                    (uint8_t)std::min(255.0, cb * shade * 255.0);
            }
        }
    }
}

}  // extern "C"

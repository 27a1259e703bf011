// Native wide-BVH builder: binned-SAH BVH2 -> arity-K collapse.
//
// C++ counterpart of gfxexp_tpu/accel/bvh_build.py (same algorithm, same
// output layout — the Python builder is the oracle; tests compare the two).
// Conceptual equivalent of the reference's software BVH builder
// (reference: common/bvh_builder.cpp — binned SAH object splits, wide nodes),
// rebuilt for the TPU framework's flat SoA node arrays.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 bvh_builder.cpp -o libbvh.so
// ABI: plain C, consumed via ctypes (gfxexp_tpu/accel/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int kNumBins = 16;

struct Vec3 {
    float x, y, z;
};

inline Vec3 vmin(const Vec3 &a, const Vec3 &b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3 &a, const Vec3 &b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Aabb {
    Vec3 lo{std::numeric_limits<float>::infinity(),
            std::numeric_limits<float>::infinity(),
            std::numeric_limits<float>::infinity()};
    Vec3 hi{-std::numeric_limits<float>::infinity(),
            -std::numeric_limits<float>::infinity(),
            -std::numeric_limits<float>::infinity()};
    void extend(const Aabb &o) {
        lo = vmin(lo, o.lo);
        hi = vmax(hi, o.hi);
    }
    float half_area() const {
        float dx = std::max(hi.x - lo.x, 0.0f);
        float dy = std::max(hi.y - lo.y, 0.0f);
        float dz = std::max(hi.z - lo.z, 0.0f);
        if (!std::isfinite(dx) || !std::isfinite(dy) || !std::isfinite(dz))
            return 0.0f;
        return dx * dy + dy * dz + dz * dx;
    }
};

struct Node2 {
    Aabb box;
    int32_t left = 0;   // child node, or first primitive (leaf)
    int32_t right = 0;  // child node (internal only)
    int32_t count = 0;  // 0 = internal, >0 = leaf primitive count
};

struct Builder {
    const float *tri_min;
    const float *tri_max;
    int32_t n_tris;
    int32_t max_leaf;
    std::vector<Vec3> centroid;
    std::vector<Aabb> boxes;
    std::vector<int32_t> perm;
    std::vector<Node2> nodes;

    Aabb prim_box(int32_t i) const { return boxes[i]; }

    int32_t alloc() {
        nodes.emplace_back();
        return static_cast<int32_t>(nodes.size()) - 1;
    }

    // Build [start, end) into node `ni`. Iterative stack to avoid deep
    // recursion on degenerate inputs.
    void build_range(int32_t root, int32_t root_start, int32_t root_end) {
        struct Item {
            int32_t node, start, end;
        };
        std::vector<Item> stack{{root, root_start, root_end}};
        while (!stack.empty()) {
            auto [ni, start, end] = stack.back();
            stack.pop_back();
            Aabb bounds;
            Aabb cbounds;
            for (int32_t i = start; i < end; ++i) {
                bounds.extend(boxes[perm[i]]);
                const Vec3 &c = centroid[perm[i]];
                cbounds.lo = vmin(cbounds.lo, c);
                cbounds.hi = vmax(cbounds.hi, c);
            }
            nodes[ni].box = bounds;
            int32_t n = end - start;
            if (n <= max_leaf) {
                nodes[ni].left = start;
                nodes[ni].count = n;
                continue;
            }
            // choose axis = largest centroid extent
            float ext[3] = {cbounds.hi.x - cbounds.lo.x,
                            cbounds.hi.y - cbounds.lo.y,
                            cbounds.hi.z - cbounds.lo.z};
            int axis = 0;
            if (ext[1] > ext[axis]) axis = 1;
            if (ext[2] > ext[axis]) axis = 2;

            int32_t mid;
            if (ext[axis] <= 1e-12f) {
                mid = start + n / 2;
                std::nth_element(
                    perm.begin() + start, perm.begin() + mid, perm.begin() + end,
                    [&](int32_t a, int32_t b) {
                        const float *pa = &centroid[a].x;
                        const float *pb = &centroid[b].x;
                        return pa[axis] < pb[axis];
                    });
            } else {
                // binned SAH
                float lo = (&cbounds.lo.x)[axis];
                float scale = kNumBins * (1.0f - 1e-6f) / ext[axis];
                Aabb bin_box[kNumBins];
                int32_t bin_count[kNumBins] = {0};
                for (int32_t i = start; i < end; ++i) {
                    const float *c = &centroid[perm[i]].x;
                    int b = static_cast<int>((c[axis] - lo) * scale);
                    b = std::min(std::max(b, 0), kNumBins - 1);
                    bin_box[b].extend(boxes[perm[i]]);
                    bin_count[b]++;
                }
                float larea[kNumBins], rarea[kNumBins];
                int32_t lcnt[kNumBins];
                {
                    Aabb acc;
                    int32_t cnt = 0;
                    for (int b = 0; b < kNumBins; ++b) {
                        acc.extend(bin_box[b]);
                        cnt += bin_count[b];
                        larea[b] = acc.half_area();
                        lcnt[b] = cnt;
                    }
                }
                {
                    Aabb acc;
                    for (int b = kNumBins - 1; b >= 0; --b) {
                        acc.extend(bin_box[b]);
                        rarea[b] = acc.half_area();
                    }
                }
                int best = -1;
                float best_cost = std::numeric_limits<float>::infinity();
                for (int b = 0; b < kNumBins - 1; ++b) {
                    if (lcnt[b] == 0 || lcnt[b] == n) continue;
                    float cost = larea[b] * lcnt[b] + rarea[b + 1] * (n - lcnt[b]);
                    if (cost < best_cost) {
                        best_cost = cost;
                        best = b;
                    }
                }
                if (best < 0) {
                    mid = start + n / 2;
                    std::nth_element(
                        perm.begin() + start, perm.begin() + mid,
                        perm.begin() + end, [&](int32_t a, int32_t b) {
                            const float *pa = &centroid[a].x;
                            const float *pb = &centroid[b].x;
                            return pa[axis] < pb[axis];
                        });
                } else {
                    auto it = std::stable_partition(
                        perm.begin() + start, perm.begin() + end,
                        [&](int32_t p) {
                            const float *c = &centroid[p].x;
                            int b = static_cast<int>((c[axis] - lo) * scale);
                            b = std::min(std::max(b, 0), kNumBins - 1);
                            return b <= best;
                        });
                    mid = static_cast<int32_t>(it - perm.begin());
                    if (mid == start || mid == end) mid = start + n / 2;
                }
            }
            int32_t l = alloc();
            int32_t r = alloc();
            nodes[ni].left = l;
            nodes[ni].right = r;
            nodes[ni].count = 0;
            stack.push_back({l, start, mid});
            stack.push_back({r, mid, end});
        }
    }
};

}  // namespace

extern "C" {

struct BvhResult {
    float *child_min;     // [n_nodes, arity, 3]
    float *child_max;     // [n_nodes, arity, 3]
    int32_t *child_idx;   // [n_nodes, arity]
    int32_t *child_count; // [n_nodes, arity]
    int32_t *perm;        // [n_tris]
    int32_t n_nodes;
    int32_t max_depth;
    int32_t n_perm;  // perm length (> n_tris for SBVH duplicates)
};


static 
// collapse BVH2 -> wide nodes (pull up largest-area internal children) and
// fill the C result. perm_data has n_perm entries (== n_tris for the plain
// builder; >= n_tris for SBVH where references duplicate).
int collapse_and_fill(const std::vector<Node2> &n2, int32_t root,
                      int32_t arity, const int32_t *perm_data,
                      int32_t n_perm, BvhResult *out) {
    std::vector<float> wmin, wmax;
    std::vector<int32_t> widx, wcount, depth_of;
    auto walloc = [&]() {
        size_t base = widx.size();
        wmin.resize((base + arity) * 3, 0.0f);
        wmax.resize((base + arity) * 3, 0.0f);
        widx.resize(base + arity, 0);
        wcount.resize(base + arity, -1);
        depth_of.push_back(0);
        return static_cast<int32_t>(base / arity);
    };
    int32_t wroot = walloc();
    int32_t max_depth = 1;
    struct WItem {
        int32_t wnode, b2node, depth;
    };
    std::vector<WItem> wstack{{wroot, root, 1}};
    std::vector<int32_t> group;
    while (!wstack.empty()) {
        auto [wnode, b2node, depth] = wstack.back();
        wstack.pop_back();
        max_depth = std::max(max_depth, depth);
        group.clear();
        if (n2[b2node].count > 0) {
            group.push_back(b2node);
        } else {
            group.push_back(n2[b2node].left);
            group.push_back(n2[b2node].right);
        }
        while (static_cast<int32_t>(group.size()) < arity) {
            int pick = -1;
            float best_area = -1.0f;
            for (size_t g = 0; g < group.size(); ++g) {
                if (n2[group[g]].count == 0) {
                    float a = n2[group[g]].box.half_area();
                    if (a > best_area) {
                        best_area = a;
                        pick = static_cast<int>(g);
                    }
                }
            }
            if (pick < 0) break;
            int32_t node = group[pick];
            group.erase(group.begin() + pick);
            group.push_back(n2[node].left);
            group.push_back(n2[node].right);
        }
        for (size_t k = 0; k < group.size(); ++k) {
            int32_t g = group[k];
            size_t off = (static_cast<size_t>(wnode) * arity + k) * 3;
            wmin[off] = n2[g].box.lo.x;
            wmin[off + 1] = n2[g].box.lo.y;
            wmin[off + 2] = n2[g].box.lo.z;
            wmax[off] = n2[g].box.hi.x;
            wmax[off + 1] = n2[g].box.hi.y;
            wmax[off + 2] = n2[g].box.hi.z;
            size_t slot = static_cast<size_t>(wnode) * arity + k;
            if (n2[g].count > 0) {
                widx[slot] = n2[g].left;
                wcount[slot] = n2[g].count;
            } else {
                int32_t sub = walloc();
                widx[slot] = sub;
                wcount[slot] = 0;
                wstack.push_back({sub, g, depth + 1});
            }
        }
    }

    int32_t n_nodes = static_cast<int32_t>(depth_of.size());
    out->n_nodes = n_nodes;
    out->max_depth = max_depth;
    out->n_perm = n_perm;
    out->child_min = static_cast<float *>(std::malloc(sizeof(float) * n_nodes * arity * 3));
    out->child_max = static_cast<float *>(std::malloc(sizeof(float) * n_nodes * arity * 3));
    out->child_idx = static_cast<int32_t *>(std::malloc(sizeof(int32_t) * n_nodes * arity));
    out->child_count = static_cast<int32_t *>(std::malloc(sizeof(int32_t) * n_nodes * arity));
    out->perm = static_cast<int32_t *>(std::malloc(sizeof(int32_t) * n_perm));
    if (!out->child_min || !out->child_max || !out->child_idx ||
        !out->child_count || !out->perm)
        return -2;
    std::memcpy(out->child_min, wmin.data(), sizeof(float) * n_nodes * arity * 3);
    std::memcpy(out->child_max, wmax.data(), sizeof(float) * n_nodes * arity * 3);
    std::memcpy(out->child_idx, widx.data(), sizeof(int32_t) * n_nodes * arity);
    std::memcpy(out->child_count, wcount.data(), sizeof(int32_t) * n_nodes * arity);
    std::memcpy(out->perm, perm_data, sizeof(int32_t) * n_perm);
    return 0;
}


int bvh_build(const float *tri_min, const float *tri_max, int32_t n_tris,
              int32_t arity, int32_t max_leaf, BvhResult *out) {
    if (n_tris <= 0 || arity < 2 || arity > 16) return -1;
    Builder b;
    b.tri_min = tri_min;
    b.tri_max = tri_max;
    b.n_tris = n_tris;
    b.max_leaf = max_leaf;
    b.centroid.resize(n_tris);
    b.boxes.resize(n_tris);
    b.perm.resize(n_tris);
    for (int32_t i = 0; i < n_tris; ++i) {
        Vec3 lo{tri_min[3 * i], tri_min[3 * i + 1], tri_min[3 * i + 2]};
        Vec3 hi{tri_max[3 * i], tri_max[3 * i + 1], tri_max[3 * i + 2]};
        b.boxes[i].lo = lo;
        b.boxes[i].hi = hi;
        b.centroid[i] = {0.5f * (lo.x + hi.x), 0.5f * (lo.y + hi.y),
                         0.5f * (lo.z + hi.z)};
        b.perm[i] = i;
    }
    b.nodes.reserve(2 * static_cast<size_t>(n_tris));
    int32_t root = b.alloc();
    b.build_range(root, 0, n_tris);
    return collapse_and_fill(b.nodes, root, arity, b.perm.data(), n_tris,
                             out);
}

// ---------------------------------------------------------------------------
// SBVH: binned object SAH + chopped-bin spatial splits with triangle
// clipping and reference duplication (reference: common/bvh_builder.cpp:313
// findBestSpatialSplit, :506 splitTriangle). Native twin of the numpy
// oracle in gfxexp_tpu/accel/bvh_build.py (_build_bvh2_spatial).
// ---------------------------------------------------------------------------

static Aabb clip_tri_to_slab(const float *v0, const float *v1,
                             const float *v2, int32_t t, const Aabb &ref,
                             int axis, float lo, float hi) {
    const float *vs[3] = {v0 + 3 * t, v1 + 3 * t, v2 + 3 * t};
    Aabb out;
    auto add = [&](const float p[3]) {
        Vec3 v{p[0], p[1], p[2]};
        out.lo = vmin(out.lo, v);
        out.hi = vmax(out.hi, v);
    };
    for (int i = 0; i < 3; ++i) {
        const float *a = vs[i];
        const float *b = vs[(i + 1) % 3];
        float aa = a[axis];
        if (aa >= lo && aa <= hi) add(a);
        float da = b[axis] - aa;
        if (std::fabs(da) > 1e-30f) {
            for (float plane : {lo, hi}) {
                float tt = (plane - aa) / da;
                if (tt >= 0.0f && tt <= 1.0f) {
                    float p[3] = {a[0] + tt * (b[0] - a[0]),
                                  a[1] + tt * (b[1] - a[1]),
                                  a[2] + tt * (b[2] - a[2])};
                    add(p);
                }
            }
        }
    }
    // clamp the slab axis exactly; intersect with the ref box
    (&out.lo.x)[axis] = std::max((&out.lo.x)[axis], lo);
    (&out.hi.x)[axis] = std::min((&out.hi.x)[axis], hi);
    out.lo = vmax(out.lo, ref.lo);
    out.hi = vmin(out.hi, ref.hi);
    if (!(out.lo.x <= out.hi.x) || !(out.lo.y <= out.hi.y) ||
        !(out.lo.z <= out.hi.z))
        return ref;  // degenerate clip: keep the (conservative) ref box
    return out;
}

int bvh_build_sbvh(const float *v0, const float *v1, const float *v2,
                   const float *tri_min, const float *tri_max,
                   int32_t n_tris, int32_t arity, int32_t max_leaf,
                   float budget_frac, float alpha, BvhResult *out) {
    if (n_tris <= 0 || arity < 2 || arity > 16) return -1;
    size_t cap = n_tris + static_cast<size_t>(budget_frac * n_tris) + 8;
    std::vector<Aabb> rbox(n_tris);
    std::vector<int32_t> rtri(n_tris);
    Aabb root_box;
    for (int32_t i = 0; i < n_tris; ++i) {
        rbox[i].lo = {tri_min[3 * i], tri_min[3 * i + 1], tri_min[3 * i + 2]};
        rbox[i].hi = {tri_max[3 * i], tri_max[3 * i + 1], tri_max[3 * i + 2]};
        rtri[i] = i;
        root_box.extend(rbox[i]);
    }
    float alpha_area = alpha * std::max(root_box.half_area() * 2.0f, 1e-30f);

    std::vector<Node2> nodes;
    std::vector<std::vector<int32_t>> leaf_refs;
    auto alloc = [&]() {
        nodes.emplace_back();
        return static_cast<int32_t>(nodes.size()) - 1;
    };

    struct Task {
        int32_t node;
        std::vector<int32_t> refs;
    };
    std::vector<Task> stack;
    {
        std::vector<int32_t> all(n_tris);
        for (int32_t i = 0; i < n_tris; ++i) all[i] = i;
        stack.push_back({alloc(), std::move(all)});
    }
    while (!stack.empty()) {
        Task task = std::move(stack.back());
        stack.pop_back();
        int32_t ni = task.node;
        auto &refs = task.refs;
        int32_t n = static_cast<int32_t>(refs.size());
        Aabb bounds, cbounds;
        for (int32_t r : refs) {
            bounds.extend(rbox[r]);
            Vec3 c{0.5f * (rbox[r].lo.x + rbox[r].hi.x),
                   0.5f * (rbox[r].lo.y + rbox[r].hi.y),
                   0.5f * (rbox[r].lo.z + rbox[r].hi.z)};
            cbounds.lo = vmin(cbounds.lo, c);
            cbounds.hi = vmax(cbounds.hi, c);
        }
        nodes[ni].box = bounds;
        if (n <= max_leaf) {
            nodes[ni].left = static_cast<int32_t>(leaf_refs.size());
            nodes[ni].count = n;
            leaf_refs.push_back(std::move(refs));
            continue;
        }
        float cext[3] = {cbounds.hi.x - cbounds.lo.x,
                         cbounds.hi.y - cbounds.lo.y,
                         cbounds.hi.z - cbounds.lo.z};
        int axis = 0;
        if (cext[1] > cext[axis]) axis = 1;
        if (cext[2] > cext[axis]) axis = 2;

        // ---- object split --------------------------------------------
        float obj_cost = std::numeric_limits<float>::infinity();
        int obj_bin = -1;
        float obj_overlap = std::numeric_limits<float>::infinity();
        float clo = (&cbounds.lo.x)[axis];
        float cscale = 0.0f;
        if (cext[axis] > 1e-12f) {
            cscale = kNumBins * (1.0f - 1e-6f) / cext[axis];
            Aabb bin_box[kNumBins];
            int32_t bin_count[kNumBins] = {0};
            for (int32_t r : refs) {
                float c = 0.5f * ((&rbox[r].lo.x)[axis] +
                                  (&rbox[r].hi.x)[axis]);
                int b = std::min(std::max(
                    static_cast<int>((c - clo) * cscale), 0), kNumBins - 1);
                bin_box[b].extend(rbox[r]);
                bin_count[b]++;
            }
            Aabb lacc[kNumBins], racc[kNumBins];
            int32_t lcnt[kNumBins];
            {
                Aabb acc; int32_t cnt = 0;
                for (int b = 0; b < kNumBins; ++b) {
                    acc.extend(bin_box[b]); cnt += bin_count[b];
                    lacc[b] = acc; lcnt[b] = cnt;
                }
            }
            {
                Aabb acc;
                for (int b = kNumBins - 1; b >= 0; --b) {
                    acc.extend(bin_box[b]); racc[b] = acc;
                }
            }
            for (int b = 0; b < kNumBins - 1; ++b) {
                if (lcnt[b] == 0 || lcnt[b] == n) continue;
                float cost = lacc[b].half_area() * lcnt[b] +
                             racc[b + 1].half_area() * (n - lcnt[b]);
                if (cost < obj_cost) {
                    obj_cost = cost;
                    obj_bin = b;
                    Aabb ov;
                    ov.lo = vmax(lacc[b].lo, racc[b + 1].lo);
                    ov.hi = vmin(lacc[b].hi, racc[b + 1].hi);
                    obj_overlap = (ov.lo.x <= ov.hi.x && ov.lo.y <= ov.hi.y
                                   && ov.lo.z <= ov.hi.z)
                        ? ov.half_area() * 2.0f : 0.0f;
                }
            }
        }

        // ---- spatial split -------------------------------------------
        float sp_cost = std::numeric_limits<float>::infinity();
        int sp_bin = -1;
        float next = (&bounds.hi.x)[axis] - (&bounds.lo.x)[axis];
        float nlo = (&bounds.lo.x)[axis];
        size_t budget_left = cap - rtri.size();
        if ((obj_bin < 0 || obj_overlap > alpha_area) && next > 1e-12f &&
            budget_left > 0) {
            float sscale = kNumBins * (1.0f - 1e-6f) / next;
            Aabb sbin[kNumBins];
            int32_t ent[kNumBins] = {0}, ext[kNumBins] = {0};
            for (int32_t r : refs) {
                int b0 = std::min(std::max(static_cast<int>(
                    ((&rbox[r].lo.x)[axis] - nlo) * sscale), 0), kNumBins - 1);
                int b1 = std::min(std::max(static_cast<int>(
                    ((&rbox[r].hi.x)[axis] - nlo) * sscale), 0), kNumBins - 1);
                ent[b0]++; ext[b1]++;
                for (int b = b0; b <= b1; ++b) {
                    float blo = nlo + b * next / kNumBins;
                    float bhi = nlo + (b + 1) * next / kNumBins;
                    sbin[b].extend(clip_tri_to_slab(
                        v0, v1, v2, rtri[r], rbox[r], axis, blo, bhi));
                }
            }
            Aabb lacc2[kNumBins], racc2[kNumBins];
            int32_t nl[kNumBins];
            {
                Aabb acc; int32_t cnt = 0;
                for (int b = 0; b < kNumBins; ++b) {
                    acc.extend(sbin[b]); cnt += ent[b];
                    lacc2[b] = acc; nl[b] = cnt;
                }
            }
            {
                Aabb acc;
                for (int b = kNumBins - 1; b >= 0; --b) {
                    acc.extend(sbin[b]); racc2[b] = acc;
                }
            }
            int32_t exited = 0;
            for (int b = 0; b < kNumBins - 1; ++b) {
                exited += ext[b];
                int32_t nr = n - exited;
                if (nl[b] == 0 || nr == 0) continue;
                float cost = lacc2[b].half_area() * nl[b] +
                             racc2[b + 1].half_area() * nr;
                if (cost < sp_cost) {
                    sp_cost = cost;
                    sp_bin = b;
                }
            }
            if (sp_bin >= 0) {
                // duplication count at the chosen plane
                int32_t dup = 0;
                for (int32_t r : refs) {
                    int b0 = std::min(std::max(static_cast<int>(
                        ((&rbox[r].lo.x)[axis] - nlo) * sscale), 0),
                        kNumBins - 1);
                    int b1 = std::min(std::max(static_cast<int>(
                        ((&rbox[r].hi.x)[axis] - nlo) * sscale), 0),
                        kNumBins - 1);
                    if (b0 <= sp_bin && b1 > sp_bin) dup++;
                }
                if (static_cast<size_t>(dup) > budget_left ||
                    dup == n)
                    sp_bin = -1;
            }
        }

        std::vector<int32_t> lrefs, rrefs;
        if (sp_bin >= 0 && sp_cost < obj_cost) {
            float sscale = kNumBins * (1.0f - 1e-6f) / next;
            float plane = nlo + (sp_bin + 1) * next / kNumBins;
            for (int32_t r : refs) {
                int b0 = std::min(std::max(static_cast<int>(
                    ((&rbox[r].lo.x)[axis] - nlo) * sscale), 0), kNumBins - 1);
                int b1 = std::min(std::max(static_cast<int>(
                    ((&rbox[r].hi.x)[axis] - nlo) * sscale), 0), kNumBins - 1);
                if (b1 <= sp_bin) {
                    lrefs.push_back(r);
                } else if (b0 > sp_bin) {
                    rrefs.push_back(r);
                } else {
                    Aabb lb = clip_tri_to_slab(v0, v1, v2, rtri[r], rbox[r],
                                               axis, (&bounds.lo.x)[axis],
                                               plane);
                    Aabb rb = clip_tri_to_slab(v0, v1, v2, rtri[r], rbox[r],
                                               axis, plane,
                                               (&bounds.hi.x)[axis]);
                    rbox[r] = lb;
                    lrefs.push_back(r);
                    int32_t nr2 = static_cast<int32_t>(rtri.size());
                    rtri.push_back(rtri[r]);
                    rbox.push_back(rb);
                    rrefs.push_back(nr2);
                }
            }
        } else if (obj_bin >= 0) {
            for (int32_t r : refs) {
                float c = 0.5f * ((&rbox[r].lo.x)[axis] +
                                  (&rbox[r].hi.x)[axis]);
                int b = std::min(std::max(
                    static_cast<int>((c - clo) * cscale), 0), kNumBins - 1);
                (b <= obj_bin ? lrefs : rrefs).push_back(r);
            }
        } else {
            // degenerate: median split by centroid
            std::vector<int32_t> sorted = refs;
            std::nth_element(sorted.begin(), sorted.begin() + n / 2,
                             sorted.end(), [&](int32_t a, int32_t b2) {
                float ca = 0.5f * ((&rbox[a].lo.x)[axis] +
                                   (&rbox[a].hi.x)[axis]);
                float cb = 0.5f * ((&rbox[b2].lo.x)[axis] +
                                   (&rbox[b2].hi.x)[axis]);
                return ca < cb;
            });
            lrefs.assign(sorted.begin(), sorted.begin() + n / 2);
            rrefs.assign(sorted.begin() + n / 2, sorted.end());
        }
        refs.clear();
        refs.shrink_to_fit();
        int32_t l = alloc(), r2 = alloc();
        nodes[ni].left = l;
        nodes[ni].right = r2;
        nodes[ni].count = 0;
        stack.push_back({l, std::move(lrefs)});
        stack.push_back({r2, std::move(rrefs)});
    }

    // leaf ranges in creation order -> perm over triangle ids
    std::vector<int32_t> perm;
    std::vector<int32_t> leaf_start(leaf_refs.size());
    for (size_t i = 0; i < leaf_refs.size(); ++i) {
        leaf_start[i] = static_cast<int32_t>(perm.size());
        for (int32_t r : leaf_refs[i]) perm.push_back(rtri[r]);
    }
    for (auto &nd : nodes)
        if (nd.count > 0) nd.left = leaf_start[nd.left];
    return collapse_and_fill(nodes, 0, arity, perm.data(),
                             static_cast<int32_t>(perm.size()), out);
}


void bvh_free(BvhResult *out) {
    std::free(out->child_min);
    std::free(out->child_max);
    std::free(out->child_idx);
    std::free(out->child_count);
    std::free(out->perm);
    std::memset(out, 0, sizeof(BvhResult));
}

}  // extern "C"

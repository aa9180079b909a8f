// Native asset pipeline: the C++ replacement for the reference's
// meshoptimizer + MikkTSpace stages (DeferredLoadingContext.cpp:266-440).
//
// Exposes a C ABI consumed from Python via ctypes
// (prosper_tpu/scene/native.py). Everything operates on caller-provided
// flat float/uint32 buffers; no allocation crosses the boundary.
//
// Components:
//  - morton_order: spatial sort keys for triangle clustering
//    (replaces meshopt's cache/overdraw optimization with the locality
//    ordering our cluster-BVH actually needs)
//  - cluster_bounds: per-cluster AABB / bounding sphere / normal cone
//    (meshopt_computeMeshletBounds analog)
//  - smooth_normals: area-weighted vertex normals
//  - lengyel_tangents: per-vertex tangent frames from UVs (legacy)
//  - mikktspace_tangents: MikkTSpace-algorithm tangents (angle-weighted,
//    per-face projected, welded wedges split by handedness)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libasset_pipeline.so
//        asset_pipeline.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <numeric>
#include <unordered_map>
#include <vector>

namespace {

inline uint32_t expand_bits10(uint32_t v)
{
    v &= 0x3FF;
    v = (v | (v << 16)) & 0x030000FF;
    v = (v | (v << 8)) & 0x0300F00F;
    v = (v | (v << 4)) & 0x030C30C3;
    v = (v | (v << 2)) & 0x09249249;
    return v;
}

struct Vec3
{
    float x, y, z;
};

inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 add(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 mul(Vec3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b)
{
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
inline float len(Vec3 a) { return std::sqrt(dot(a, a)); }
inline Vec3 norm(Vec3 a)
{
    float l = len(a);
    return l > 1e-20f ? mul(a, 1.f / l) : Vec3{0, 0, 1};
}

} // namespace

extern "C" {

// Sort order of triangle centroids along a 30-bit Morton curve.
// positions: (n_verts, 3) f32; indices: (n_tris, 3) u32;
// out_order: (n_tris) u32 (permutation).
void morton_order(
    const float *positions, uint64_t n_verts, const uint32_t *indices,
    uint64_t n_tris, uint32_t *out_order)
{
    (void)n_verts;
    std::vector<float> cx(n_tris), cy(n_tris), cz(n_tris);
    float mnx = 1e30f, mny = 1e30f, mnz = 1e30f;
    float mxx = -1e30f, mxy = -1e30f, mxz = -1e30f;
    for (uint64_t t = 0; t < n_tris; ++t)
    {
        float sx = 0, sy = 0, sz = 0;
        for (int k = 0; k < 3; ++k)
        {
            const float *p = positions + 3ull * indices[3 * t + k];
            sx += p[0];
            sy += p[1];
            sz += p[2];
        }
        cx[t] = sx / 3.f;
        cy[t] = sy / 3.f;
        cz[t] = sz / 3.f;
        mnx = std::min(mnx, cx[t]); mxx = std::max(mxx, cx[t]);
        mny = std::min(mny, cy[t]); mxy = std::max(mxy, cy[t]);
        mnz = std::min(mnz, cz[t]); mxz = std::max(mxz, cz[t]);
    }
    const float ex = std::max(mxx - mnx, 1e-12f);
    const float ey = std::max(mxy - mny, 1e-12f);
    const float ez = std::max(mxz - mnz, 1e-12f);
    std::vector<uint64_t> keyed(n_tris);
    for (uint64_t t = 0; t < n_tris; ++t)
    {
        uint32_t qx = (uint32_t)std::min(1023.f, (cx[t] - mnx) / ex * 1023.f);
        uint32_t qy = (uint32_t)std::min(1023.f, (cy[t] - mny) / ey * 1023.f);
        uint32_t qz = (uint32_t)std::min(1023.f, (cz[t] - mnz) / ez * 1023.f);
        uint64_t code = (expand_bits10(qx) << 2) | (expand_bits10(qy) << 1) |
                        expand_bits10(qz);
        keyed[t] = (code << 32) | t; // stable: tie-break by index
    }
    std::sort(keyed.begin(), keyed.end());
    for (uint64_t t = 0; t < n_tris; ++t)
        out_order[t] = (uint32_t)(keyed[t] & 0xFFFFFFFFu);
}

// Per-cluster bounds over Morton-ordered triangles.
// tris are pre-ordered; cluster c covers [offsets[c], offsets[c]+counts[c]).
// Outputs: aabb_min/max (C,3), sphere_center (C,3), sphere_radius (C),
// cone_axis (C,3), cone_cutoff (C).
void cluster_bounds(
    const float *positions, const uint32_t *indices, const uint32_t *offsets,
    const uint32_t *counts, uint64_t n_clusters, float *aabb_min,
    float *aabb_max, float *sphere_center, float *sphere_radius,
    float *cone_axis, float *cone_cutoff)
{
    for (uint64_t c = 0; c < n_clusters; ++c)
    {
        const uint32_t s = offsets[c], n = counts[c];
        Vec3 mn{1e30f, 1e30f, 1e30f}, mx{-1e30f, -1e30f, -1e30f};
        Vec3 axis{0, 0, 0};
        std::vector<Vec3> normals(n);
        for (uint32_t i = 0; i < n; ++i)
        {
            Vec3 v[3];
            for (int k = 0; k < 3; ++k)
            {
                const float *p = positions + 3ull * indices[3ull * (s + i) + k];
                v[k] = {p[0], p[1], p[2]};
                mn.x = std::min(mn.x, p[0]); mx.x = std::max(mx.x, p[0]);
                mn.y = std::min(mn.y, p[1]); mx.y = std::max(mx.y, p[1]);
                mn.z = std::min(mn.z, p[2]); mx.z = std::max(mx.z, p[2]);
            }
            Vec3 fn = cross(sub(v[1], v[0]), sub(v[2], v[0]));
            axis = add(axis, fn); // area weighted
            normals[i] = norm(fn);
        }
        aabb_min[3 * c + 0] = mn.x; aabb_min[3 * c + 1] = mn.y; aabb_min[3 * c + 2] = mn.z;
        aabb_max[3 * c + 0] = mx.x; aabb_max[3 * c + 1] = mx.y; aabb_max[3 * c + 2] = mx.z;
        Vec3 center = mul(add(mn, mx), .5f);
        sphere_center[3 * c + 0] = center.x;
        sphere_center[3 * c + 1] = center.y;
        sphere_center[3 * c + 2] = center.z;
        float r2 = 0.f;
        for (uint32_t i = 0; i < n; ++i)
            for (int k = 0; k < 3; ++k)
            {
                const float *p = positions + 3ull * indices[3ull * (s + i) + k];
                Vec3 d = sub({p[0], p[1], p[2]}, center);
                r2 = std::max(r2, dot(d, d));
            }
        sphere_radius[c] = std::sqrt(r2);

        float alen = len(axis);
        if (alen < 1e-12f || n == 0)
        {
            cone_axis[3 * c + 0] = 0; cone_axis[3 * c + 1] = 0; cone_axis[3 * c + 2] = 1;
            cone_cutoff[c] = 1.f; // degenerate: never cull
            continue;
        }
        Vec3 a = mul(axis, 1.f / alen);
        cone_axis[3 * c + 0] = a.x; cone_axis[3 * c + 1] = a.y; cone_axis[3 * c + 2] = a.z;
        float min_dot = 1.f;
        for (uint32_t i = 0; i < n; ++i)
            min_dot = std::min(min_dot, dot(normals[i], a));
        cone_cutoff[c] =
            min_dot <= 0.f ? 1.f : std::sqrt(std::max(0.f, 1.f - min_dot * min_dot));
    }
}

// Area-weighted smooth vertex normals.
void smooth_normals(
    const float *positions, uint64_t n_verts, const uint32_t *indices,
    uint64_t n_tris, float *out_normals)
{
    std::memset(out_normals, 0, sizeof(float) * 3 * n_verts);
    for (uint64_t t = 0; t < n_tris; ++t)
    {
        const uint32_t i0 = indices[3 * t], i1 = indices[3 * t + 1],
                       i2 = indices[3 * t + 2];
        const float *p0 = positions + 3ull * i0;
        const float *p1 = positions + 3ull * i1;
        const float *p2 = positions + 3ull * i2;
        Vec3 fn = cross(
            {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]},
            {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]});
        for (uint32_t vi : {i0, i1, i2})
        {
            out_normals[3 * vi + 0] += fn.x;
            out_normals[3 * vi + 1] += fn.y;
            out_normals[3 * vi + 2] += fn.z;
        }
    }
    for (uint64_t v = 0; v < n_verts; ++v)
    {
        Vec3 n = norm(
            {out_normals[3 * v], out_normals[3 * v + 1], out_normals[3 * v + 2]});
        out_normals[3 * v] = n.x;
        out_normals[3 * v + 1] = n.y;
        out_normals[3 * v + 2] = n.z;
    }
}

// UV-based per-vertex tangents (Lengyel's method with Gram-Schmidt
// orthogonalisation + handedness sign), the MikkTSpace-stage analog.
// out_tangents: (n_verts, 4) xyz + sign w.
void lengyel_tangents(
    const float *positions, const float *normals, const float *uvs,
    uint64_t n_verts, const uint32_t *indices, uint64_t n_tris,
    float *out_tangents)
{
    std::vector<Vec3> tan(n_verts, {0, 0, 0}), bit(n_verts, {0, 0, 0});
    for (uint64_t t = 0; t < n_tris; ++t)
    {
        const uint32_t i0 = indices[3 * t], i1 = indices[3 * t + 1],
                       i2 = indices[3 * t + 2];
        const float *p0 = positions + 3ull * i0;
        const float *p1 = positions + 3ull * i1;
        const float *p2 = positions + 3ull * i2;
        const float *w0 = uvs + 2ull * i0;
        const float *w1 = uvs + 2ull * i1;
        const float *w2 = uvs + 2ull * i2;

        Vec3 e1 = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
        Vec3 e2 = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
        float x1 = w1[0] - w0[0], x2 = w2[0] - w0[0];
        float y1 = w1[1] - w0[1], y2 = w2[1] - w0[1];
        float det = x1 * y2 - x2 * y1;
        if (std::fabs(det) < 1e-12f)
            continue;
        float r = 1.f / det;
        Vec3 sdir = mul(sub(mul(e1, y2), mul(e2, y1)), r);
        Vec3 tdir = mul(sub(mul(e2, x1), mul(e1, x2)), r);
        for (uint32_t vi : {i0, i1, i2})
        {
            tan[vi] = add(tan[vi], sdir);
            bit[vi] = add(bit[vi], tdir);
        }
    }
    for (uint64_t v = 0; v < n_verts; ++v)
    {
        Vec3 n = {normals[3 * v], normals[3 * v + 1], normals[3 * v + 2]};
        Vec3 t = tan[v];
        // Gram-Schmidt
        Vec3 tn = sub(t, mul(n, dot(n, t)));
        float tl = len(tn);
        if (tl < 1e-12f)
        {
            // fallback: any frame orthogonal to n
            Vec3 ref = std::fabs(n.y) < .99f ? Vec3{0, 1, 0} : Vec3{1, 0, 0};
            tn = norm(cross(ref, n));
            out_tangents[4 * v + 0] = tn.x;
            out_tangents[4 * v + 1] = tn.y;
            out_tangents[4 * v + 2] = tn.z;
            out_tangents[4 * v + 3] = 1.f;
            continue;
        }
        tn = mul(tn, 1.f / tl);
        float sign = dot(cross(n, tn), bit[v]) < 0.f ? -1.f : 1.f;
        out_tangents[4 * v + 0] = tn.x;
        out_tangents[4 * v + 1] = tn.y;
        out_tangents[4 * v + 2] = tn.z;
        out_tangents[4 * v + 3] = sign;
    }
}

} // extern "C"

// ---------------------------------------------------------------------------
// MikkTSpace tangents — algorithm port (NOT a copy of mikktspace.c; the
// reference links the real library, DeferredLoadingContext.cpp:266-338).
// Semantics reproduced:
//  - per-face tangent from UV derivatives with orientation (handedness)
//  - per-corner contribution PROJECTED onto the vertex normal's plane and
//    normalized BEFORE accumulation
//  - accumulation weighted by the corner's wedge ANGLE
//  - wedges weld by exact (position, normal, uv) equality, split by
//    orientation, so mirrored seams keep distinct frames
//  - degenerate-UV faces contribute nothing; empty groups fall back to an
//    arbitrary orthonormal frame
// Output per VERTEX (glTF meshes are indexed; wedges of one index share
// attributes, which is exactly the weld key).

extern "C" void mikktspace_tangents(
    const float *positions, const float *normals, const float *uvs,
    uint64_t n_verts, const uint32_t *indices, uint64_t n_tris,
    float *out_tangents)
{
    // weld: map exact (pos, normal, uv) bits -> canonical vertex
    struct Key
    {
        uint32_t b[8];
        bool operator==(const Key &o) const
        {
            return std::memcmp(b, o.b, sizeof(b)) == 0;
        }
    };
    struct KeyHash
    {
        size_t operator()(const Key &k) const
        {
            uint64_t h = 1469598103934665603ull;
            for (uint32_t w : k.b)
            {
                h ^= w;
                h *= 1099511628211ull;
            }
            return (size_t)h;
        }
    };
    std::vector<uint32_t> canon(n_verts);
    {
        std::unordered_map<Key, uint32_t, KeyHash> weld;
        weld.reserve(n_verts);
        for (uint64_t v = 0; v < n_verts; ++v)
        {
            Key k;
            std::memcpy(k.b + 0, positions + 3 * v, 12);
            std::memcpy(k.b + 3, normals + 3 * v, 12);
            std::memcpy(k.b + 6, uvs + 2 * v, 8);
            auto it = weld.emplace(k, (uint32_t)v);
            canon[v] = it.first->second;
        }
    }

    // group accumulators: canonical vertex x orientation {+,-}
    std::vector<Vec3> acc(2 * n_verts, {0, 0, 0});
    std::vector<float> wsum(2 * n_verts, 0.f);

    auto corner_angle = [&](Vec3 a, Vec3 b) {
        float d = dot(norm(a), norm(b));
        d = std::max(-1.f, std::min(1.f, d));
        return std::acos(d);
    };

    for (uint64_t t = 0; t < n_tris; ++t)
    {
        const uint32_t idx[3] = {indices[3 * t], indices[3 * t + 1],
                                 indices[3 * t + 2]};
        Vec3 p[3], nrm_[3];
        float w[3][2];
        for (int c = 0; c < 3; ++c)
        {
            p[c] = {positions[3 * idx[c]], positions[3 * idx[c] + 1],
                    positions[3 * idx[c] + 2]};
            nrm_[c] = {normals[3 * idx[c]], normals[3 * idx[c] + 1],
                       normals[3 * idx[c] + 2]};
            w[c][0] = uvs[2 * idx[c]];
            w[c][1] = uvs[2 * idx[c] + 1];
        }
        Vec3 e1 = sub(p[1], p[0]), e2 = sub(p[2], p[0]);
        float x1 = w[1][0] - w[0][0], x2 = w[2][0] - w[0][0];
        float y1 = w[1][1] - w[0][1], y2 = w[2][1] - w[0][1];
        float det = x1 * y2 - x2 * y1;
        if (std::fabs(det) < 1e-12f)
            continue; // degenerate UVs: no contribution
        float inv = 1.f / det;
        // dP/du (the "vOs" direction mikktspace accumulates)
        Vec3 tface = mul(sub(mul(e1, y2), mul(e2, y1)), inv);
        if (len(tface) < 1e-20f)
            continue;
        int orient = det < 0.f ? 1 : 0; // 1 = mirrored

        for (int c = 0; c < 3; ++c)
        {
            Vec3 n = norm(nrm_[c]);
            // project onto the normal plane, normalize BEFORE averaging
            Vec3 tp = sub(tface, mul(n, dot(n, tface)));
            float tl = len(tp);
            if (tl < 1e-20f)
                continue;
            tp = mul(tp, 1.f / tl);
            Vec3 ea = sub(p[(c + 1) % 3], p[c]);
            Vec3 eb = sub(p[(c + 2) % 3], p[c]);
            float ang = corner_angle(ea, eb);
            uint64_t g = 2ull * canon[idx[c]] + orient;
            acc[g] = add(acc[g], mul(tp, ang));
            wsum[g] += ang;
        }
    }

    for (uint64_t v = 0; v < n_verts; ++v)
    {
        Vec3 n = norm({normals[3 * v], normals[3 * v + 1],
                       normals[3 * v + 2]});
        // prefer the orientation group this vertex actually accumulated;
        // unmirrored wins ties (mikktspace assigns per wedge — indexed
        // meshes split mirrored wedges into their own vertices)
        uint64_t g0 = 2ull * canon[v], g1 = g0 + 1;
        uint64_t g = wsum[g0] >= wsum[g1] ? g0 : g1;
        float sign = (g == g1) ? -1.f : 1.f;
        Vec3 tsum = acc[g];
        // final projection + normalize (group sums stay near the plane
        // but re-orthogonalize like mikktspace's output step)
        Vec3 tp = sub(tsum, mul(n, dot(n, tsum)));
        float tl = len(tp);
        if (wsum[g] <= 0.f || tl < 1e-20f)
        {
            Vec3 ref = std::fabs(n.y) < .99f ? Vec3{0, 1, 0} : Vec3{1, 0, 0};
            Vec3 tn = norm(cross(ref, n));
            out_tangents[4 * v + 0] = tn.x;
            out_tangents[4 * v + 1] = tn.y;
            out_tangents[4 * v + 2] = tn.z;
            out_tangents[4 * v + 3] = 1.f;
            continue;
        }
        tp = mul(tp, 1.f / tl);
        out_tangents[4 * v + 0] = tp.x;
        out_tangents[4 * v + 1] = tp.y;
        out_tangents[4 * v + 2] = tp.z;
        out_tangents[4 * v + 3] = sign;
    }
}

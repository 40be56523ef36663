// Fast Wavefront-OBJ parser (native scene-IO hot path).
//
// Mirrors the Python loader's semantics (gpuspectral_tpu/scene/obj.py, which
// itself mirrors the reference's tinyobj import, Loader.cpp:19-64): every
// face-vertex becomes its own vertex (unindexed triangle soup), polygons are
// fan-triangulated, missing normals get the geometric face normal, missing
// uvs get zeros.
//
// C ABI for ctypes:
//   obj_parse(path, &handle)      -> triangle count (or -1)
//   obj_fill(handle, pos, nrm, uv)-> copies (N,3,3)/(N,3,3)/(N,3,2) f32
//   obj_free(handle)
//
// Two-phase so Python allocates numpy buffers of exactly the right size.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
};
struct Vec2 {
    float x, y;
};

struct ParsedObj {
    std::vector<float> pos;  // N*9
    std::vector<float> nrm;  // N*9
    std::vector<float> uv;   // N*6
};

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
    return p;
}

inline const char* parse_float(const char* p, const char* end, float* out) {
    char* q = nullptr;
    *out = strtof(p, &q);
    return (q && q <= end) ? q : p;
}

inline const char* parse_int(const char* p, const char* end, long* out) {
    char* q = nullptr;
    *out = strtol(p, &q, 10);
    return (q && q <= end) ? q : p;
}

}  // namespace

extern "C" {

long obj_parse(const char* path, void** handle_out) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (size > 0 && fread(buf.data(), 1, size, f) != (size_t)size) {
        fclose(f);
        return -1;
    }
    fclose(f);
    buf[size] = '\0';

    std::vector<Vec3> vs, vns;
    std::vector<Vec2> vts;
    auto* out = new ParsedObj();

    struct Corner {
        long vi, ti, ni;
    };
    std::vector<Corner> corners;  // reused per face

    const char* p = buf.data();
    const char* end = buf.data() + size;
    while (p < end) {
        const char* line_end = (const char*)memchr(p, '\n', end - p);
        if (!line_end) line_end = end;
        const char* q = skip_ws(p, line_end);
        if (line_end - q >= 2) {
            if (q[0] == 'v' && (q[1] == ' ' || q[1] == '\t')) {
                Vec3 v;
                q = parse_float(q + 1, line_end, &v.x);
                q = parse_float(q, line_end, &v.y);
                q = parse_float(q, line_end, &v.z);
                vs.push_back(v);
            } else if (q[0] == 'v' && q[1] == 't') {
                Vec2 t;
                q = parse_float(q + 2, line_end, &t.x);
                q = parse_float(q, line_end, &t.y);
                vts.push_back(t);
            } else if (q[0] == 'v' && q[1] == 'n') {
                Vec3 n;
                q = parse_float(q + 2, line_end, &n.x);
                q = parse_float(q, line_end, &n.y);
                q = parse_float(q, line_end, &n.z);
                vns.push_back(n);
            } else if (q[0] == 'f' && (q[1] == ' ' || q[1] == '\t')) {
                corners.clear();
                q++;
                while (q < line_end) {
                    q = skip_ws(q, line_end);
                    if (q >= line_end) break;
                    Corner c{0, 0, 0};
                    const char* q2 = parse_int(q, line_end, &c.vi);
                    if (q2 == q) break;
                    q = q2;
                    if (q < line_end && *q == '/') {
                        q++;
                        if (q < line_end && *q != '/') q = parse_int(q, line_end, &c.ti);
                        if (q < line_end && *q == '/') {
                            q++;
                            q = parse_int(q, line_end, &c.ni);
                        }
                    }
                    corners.push_back(c);
                }
                auto resolve = [](long idx, size_t n) -> long {
                    return idx > 0 ? idx - 1 : (long)n + idx;
                };
                // fan triangulation
                for (size_t k = 1; k + 1 < corners.size(); k++) {
                    const Corner tri[3] = {corners[0], corners[k], corners[k + 1]};
                    Vec3 pv[3];
                    bool have_n = true;
                    Vec3 nv[3];
                    Vec2 tv[3];
                    for (int j = 0; j < 3; j++) {
                        long vi = resolve(tri[j].vi, vs.size());
                        pv[j] = (vi >= 0 && vi < (long)vs.size()) ? vs[vi] : Vec3{0, 0, 0};
                        if (tri[j].ni != 0 && !vns.empty()) {
                            long ni = resolve(tri[j].ni, vns.size());
                            nv[j] = (ni >= 0 && ni < (long)vns.size()) ? vns[ni] : Vec3{0, 0, 1};
                        } else {
                            have_n = false;
                        }
                        if (tri[j].ti != 0 && !vts.empty()) {
                            long ti = resolve(tri[j].ti, vts.size());
                            tv[j] = (ti >= 0 && ti < (long)vts.size()) ? vts[ti] : Vec2{0, 0};
                        } else {
                            tv[j] = Vec2{0, 0};
                        }
                    }
                    if (!have_n) {
                        // geometric normal
                        Vec3 e1{pv[1].x - pv[0].x, pv[1].y - pv[0].y, pv[1].z - pv[0].z};
                        Vec3 e2{pv[2].x - pv[0].x, pv[2].y - pv[0].y, pv[2].z - pv[0].z};
                        Vec3 g{e1.y * e2.z - e1.z * e2.y, e1.z * e2.x - e1.x * e2.z,
                               e1.x * e2.y - e1.y * e2.x};
                        float len = std::sqrt(g.x * g.x + g.y * g.y + g.z * g.z);
                        if (len < 1e-20f) len = 1e-20f;
                        g = {g.x / len, g.y / len, g.z / len};
                        nv[0] = nv[1] = nv[2] = g;
                    }
                    for (int j = 0; j < 3; j++) {
                        out->pos.push_back(pv[j].x);
                        out->pos.push_back(pv[j].y);
                        out->pos.push_back(pv[j].z);
                        out->nrm.push_back(nv[j].x);
                        out->nrm.push_back(nv[j].y);
                        out->nrm.push_back(nv[j].z);
                        out->uv.push_back(tv[j].x);
                        out->uv.push_back(tv[j].y);
                    }
                }
            }
        }
        p = line_end + 1;
    }

    *handle_out = out;
    return (long)(out->pos.size() / 9);
}

void obj_fill(void* handle, float* pos, float* nrm, float* uv) {
    auto* o = (ParsedObj*)handle;
    memcpy(pos, o->pos.data(), o->pos.size() * sizeof(float));
    memcpy(nrm, o->nrm.data(), o->nrm.size() * sizeof(float));
    memcpy(uv, o->uv.data(), o->uv.size() * sizeof(float));
}

void obj_free(void* handle) { delete (ParsedObj*)handle; }

}  // extern "C"

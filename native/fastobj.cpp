// fastobj — native OBJ parser for the asset-IO runtime path.
//
// The reference parses OBJ with FParsec combinators on .NET
// (Models/ObjModelLoader.fs) — convenient but slow for large meshes
// (Renault12TL: 37k faces). This is the framework's native-runtime
// equivalent: a single-pass C parser exposed through a C ABI consumed from
// Python via ctypes (io/native.py), with the pure-Python parser as
// fallback. Grammar coverage matches io/obj.py: v/vt/vn, faces with
// a | a/b | a//c | a/b/c corners, negative (relative) indices, g/o groups,
// usemtl, mtllib, fan triangulation of n-gons.
//
// Build: g++ -O3 -march=native -shared -fPIC fastobj.cpp -o libfastobj.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Obj {
  std::vector<float> vertices;   // 3 * nv
  std::vector<float> uvs;        // 2 * nt
  std::vector<float> normals;    // 3 * nn
  // per triangle corner: vertex / uv / normal indices (-1 = absent)
  std::vector<int32_t> face_v;   // 3 * nf
  std::vector<int32_t> face_t;
  std::vector<int32_t> face_n;
  std::vector<int32_t> face_group;     // nf
  std::vector<int32_t> face_material;  // nf (-1 = none)
  std::string group_names;             // '\n'-joined, in id order
  std::string material_names;          // '\n'-joined, in id order
  std::string mtllibs;                 // '\n'-joined
};

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// fast float parse (strtof handles all OBJ numerics; locale-safe enough
// for '.'-decimal files, which OBJ mandates)
inline const char* parse_float(const char* p, const char* end, float* out) {
  char* q;
  *out = strtof(p, &q);
  (void)end;
  return q;
}

inline const char* parse_int(const char* p, char** q, long* out) {
  *out = strtol(p, q, 10);
  return *q;
}

inline int32_t resolve(long idx, size_t count) {
  if (idx > 0) return (int32_t)(idx - 1);
  if (idx < 0) return (int32_t)((long)count + idx);
  return -1;
}

struct Corner { int32_t v, t, n; };

}  // namespace

extern "C" {

Obj* fastobj_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize((size_t)size);
  if (size > 0 && fread(&buf[0], 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  Obj* o = new Obj();
  std::unordered_map<std::string, int32_t> groups;
  std::unordered_map<std::string, int32_t> materials;
  int32_t cur_group = -1;
  int32_t cur_mtl = -1;

  auto intern_group = [&](const std::string& name) {
    auto it = groups.find(name);
    if (it != groups.end()) return it->second;
    int32_t id = (int32_t)groups.size();
    groups.emplace(name, id);
    if (!o->group_names.empty()) o->group_names += '\n';
    o->group_names += name;
    return id;
  };
  cur_group = intern_group("default");

  const char* p = buf.data();
  const char* end = p + buf.size();
  std::vector<Corner> corners;
  corners.reserve(8);

  while (p < end) {
    p = skip_ws(p, end);
    if (p >= end) break;
    char c0 = p[0];
    char c1 = (p + 1 < end) ? p[1] : '\0';

    if (c0 == 'v' && (c1 == ' ' || c1 == '\t')) {
      float x = 0, y = 0, z = 0;
      p = parse_float(p + 1, end, &x);
      p = parse_float(p, end, &y);
      p = parse_float(p, end, &z);
      o->vertices.push_back(x);
      o->vertices.push_back(y);
      o->vertices.push_back(z);
    } else if (c0 == 'v' && c1 == 't') {
      float u = 0, v = 0;
      p = parse_float(p + 2, end, &u);
      p = parse_float(p, end, &v);
      o->uvs.push_back(u);
      o->uvs.push_back(v);
    } else if (c0 == 'v' && c1 == 'n') {
      float x = 0, y = 0, z = 0;
      p = parse_float(p + 2, end, &x);
      p = parse_float(p, end, &y);
      p = parse_float(p, end, &z);
      o->normals.push_back(x);
      o->normals.push_back(y);
      o->normals.push_back(z);
    } else if (c0 == 'f' && (c1 == ' ' || c1 == '\t')) {
      corners.clear();
      const char* q = p + 1;
      while (true) {
        q = skip_ws(q, end);
        if (q >= end || *q == '\n' || *q == '#') break;
        char* after;
        long vi;
        parse_int(q, &after, &vi);
        if (after == q) break;
        Corner c{resolve(vi, o->vertices.size() / 3), -1, -1};
        q = after;
        if (q < end && *q == '/') {
          ++q;
          if (q < end && *q != '/') {
            long ti;
            parse_int(q, &after, &ti);
            c.t = resolve(ti, o->uvs.size() / 2);
            q = after;
          }
          if (q < end && *q == '/') {
            ++q;
            long ni;
            parse_int(q, &after, &ni);
            if (after != q) {
              c.n = resolve(ni, o->normals.size() / 3);
              q = after;
            }
          }
        }
        corners.push_back(c);
      }
      // fan triangulation: (0, i, i+1) — same split as io/obj.py and the
      // reference's quad Rect split
      for (size_t i = 1; i + 1 < corners.size(); ++i) {
        const Corner tri[3] = {corners[0], corners[i], corners[i + 1]};
        for (const Corner& c : tri) {
          o->face_v.push_back(c.v);
          o->face_t.push_back(c.t);
          o->face_n.push_back(c.n);
        }
        o->face_group.push_back(cur_group);
        o->face_material.push_back(cur_mtl);
      }
      p = q;
    } else if ((c0 == 'g' || c0 == 'o') && (c1 == ' ' || c1 == '\t')) {
      const char* q = skip_ws(p + 1, end);
      const char* e = q;
      while (e < end && *e != '\n' && *e != '\r' && *e != ' ') ++e;
      cur_group = intern_group(std::string(q, e));
      p = e;
    } else if (!strncmp(p, "usemtl", 6)) {
      const char* q = skip_ws(p + 6, end);
      const char* e = q;
      while (e < end && *e != '\n' && *e != '\r') ++e;
      std::string name(q, e);
      auto it = materials.find(name);
      if (it == materials.end()) {
        cur_mtl = (int32_t)materials.size();
        materials.emplace(name, cur_mtl);
        if (!o->material_names.empty()) o->material_names += '\n';
        o->material_names += name;
      } else {
        cur_mtl = it->second;
      }
      p = e;
    } else if (!strncmp(p, "mtllib", 6)) {
      const char* q = skip_ws(p + 6, end);
      const char* e = q;
      while (e < end && *e != '\n' && *e != '\r') ++e;
      if (!o->mtllibs.empty()) o->mtllibs += '\n';
      o->mtllibs.append(q, e);
      p = e;
    }
    p = next_line(p, end);
  }
  return o;
}

void fastobj_free(Obj* o) { delete o; }

int64_t fastobj_num_vertices(Obj* o) { return (int64_t)(o->vertices.size() / 3); }
int64_t fastobj_num_uvs(Obj* o) { return (int64_t)(o->uvs.size() / 2); }
int64_t fastobj_num_normals(Obj* o) { return (int64_t)(o->normals.size() / 3); }
int64_t fastobj_num_faces(Obj* o) { return (int64_t)o->face_group.size(); }

const float* fastobj_vertices(Obj* o) { return o->vertices.data(); }
const float* fastobj_uvs(Obj* o) { return o->uvs.data(); }
const float* fastobj_normals(Obj* o) { return o->normals.data(); }
const int32_t* fastobj_face_v(Obj* o) { return o->face_v.data(); }
const int32_t* fastobj_face_t(Obj* o) { return o->face_t.data(); }
const int32_t* fastobj_face_n(Obj* o) { return o->face_n.data(); }
const int32_t* fastobj_face_group(Obj* o) { return o->face_group.data(); }
const int32_t* fastobj_face_material(Obj* o) { return o->face_material.data(); }
const char* fastobj_group_names(Obj* o) { return o->group_names.c_str(); }
const char* fastobj_material_names(Obj* o) { return o->material_names.c_str(); }
const char* fastobj_mtllibs(Obj* o) { return o->mtllibs.c_str(); }

}  // extern "C"

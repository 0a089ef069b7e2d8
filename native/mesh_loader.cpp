// Native mesh loaders: Wavefront OBJ and PLY (ascii + binary_little_endian).
//
// The reference loads models through assimp / tinygltf / its own NBT reader
// (`SDK/imgui_test/triangle_gas.cpp:16-168`, vendored tinygltf). GLTF is
// handled in Python (scene/gltf.py); OBJ/PLY — the formats assimp covered —
// are parsed here in C++ for large-asset load speed, exposed over a C ABI
// consumed by ctypes (optix_raytracer_tpu/io/meshio.py), with a pure-numpy
// fallback when no toolchain exists.
//
// Exports:
//   ort_load_mesh(path, &pos,&nv, &idx,&nt, &nrm,&has_n, &uv,&has_uv, err)
//     -> 0 on success; caller frees via ort_free_mesh.
//   ort_free_mesh(pos, idx, nrm, uv)
//
// OBJ: v/vt/vn + f with arbitrary polygon fans, v//vn and negative indices;
//      distinct (v,vt,vn) triples become distinct output vertices.
// PLY: header-driven; vertex props x y z [nx ny nz] [u v|s t]; face
//      vertex_indices lists (any integer count/index types); ascii and
//      binary little-endian.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Mesh {
  std::vector<float> pos;     // 3 per vertex
  std::vector<float> nrm;     // 3 per vertex (empty if absent)
  std::vector<float> uv;      // 2 per vertex (empty if absent)
  std::vector<int32_t> idx;   // 3 per triangle
};

void set_err(char* err, const std::string& msg) {
  if (err) {
    std::snprintf(err, 256, "%s", msg.c_str());
  }
}

// ---------------------------------------------------------------- OBJ ----

bool load_obj(FILE* f, Mesh* out, char* err) {
  std::vector<float> vs, vts, vns;
  // Unified output vertex per distinct (v, vt, vn) triple.
  std::unordered_map<uint64_t, int32_t> remap;
  bool any_n = false, any_t = false;

  auto key_of = [](int v, int t, int n) -> uint64_t {
    // 21 bits each is ~2M distinct source indices — plenty for OBJ assets.
    return (uint64_t(uint32_t(v) & 0x1FFFFF) << 42) |
           (uint64_t(uint32_t(t) & 0x1FFFFF) << 21) |
           (uint64_t(uint32_t(n) & 0x1FFFFF));
  };

  auto emit = [&](int v, int t, int n) -> int32_t {
    uint64_t k = key_of(v, t, n);
    auto it = remap.find(k);
    if (it != remap.end()) return it->second;
    int32_t id = int32_t(out->pos.size() / 3);
    out->pos.push_back(vs[3 * v + 0]);
    out->pos.push_back(vs[3 * v + 1]);
    out->pos.push_back(vs[3 * v + 2]);
    if (n >= 0 && 3 * size_t(n) + 2 < vns.size()) {
      any_n = true;
      out->nrm.push_back(vns[3 * n + 0]);
      out->nrm.push_back(vns[3 * n + 1]);
      out->nrm.push_back(vns[3 * n + 2]);
    } else {
      out->nrm.push_back(0.f); out->nrm.push_back(0.f);
      out->nrm.push_back(0.f);
    }
    if (t >= 0 && 2 * size_t(t) + 1 < vts.size()) {
      any_t = true;
      out->uv.push_back(vts[2 * t + 0]);
      out->uv.push_back(vts[2 * t + 1]);
    } else {
      out->uv.push_back(0.f); out->uv.push_back(0.f);
    }
    remap.emplace(k, id);
    return id;
  };

  // resolve 1-based / negative OBJ indices to 0-based
  auto resolve = [](long raw, size_t count) -> int {
    if (raw > 0) return int(raw - 1);
    if (raw < 0) return int(long(count) + raw);
    return -1;
  };

  char line[4096];
  int lineno = 0;
  while (std::fgets(line, sizeof line, f)) {
    ++lineno;
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == 'v' && (s[1] == ' ' || s[1] == '\t')) {
      float x, y, z;
      if (std::sscanf(s + 2, "%f %f %f", &x, &y, &z) == 3) {
        vs.push_back(x); vs.push_back(y); vs.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 'n') {
      float x, y, z;
      if (std::sscanf(s + 2, "%f %f %f", &x, &y, &z) == 3) {
        vns.push_back(x); vns.push_back(y); vns.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 't') {
      float u, v;
      if (std::sscanf(s + 2, "%f %f", &u, &v) == 2) {
        vts.push_back(u); vts.push_back(v);
      }
    } else if (s[0] == 'f' && (s[1] == ' ' || s[1] == '\t')) {
      std::vector<int32_t> poly;
      char* p = s + 1;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        long vi = 0, ti = 0, ni = 0;
        bool has_t = false, has_nn = false;
        char* q;
        vi = std::strtol(p, &q, 10);
        if (q == p) break;
        p = q;
        if (*p == '/') {
          ++p;
          if (*p != '/') { ti = std::strtol(p, &q, 10); has_t = q != p; p = q; }
          if (*p == '/') { ++p; ni = std::strtol(p, &q, 10); has_nn = q != p; p = q; }
        }
        int v = resolve(vi, vs.size() / 3);
        int t = has_t ? resolve(ti, vts.size() / 2) : -1;
        int n = has_nn ? resolve(ni, vns.size() / 3) : -1;
        if (v < 0 || 3 * size_t(v) + 2 >= vs.size()) {
          set_err(err, "obj: bad vertex index at line " +
                           std::to_string(lineno));
          return false;
        }
        poly.push_back(emit(v, t, n));
      }
      for (size_t i = 2; i < poly.size(); ++i) {   // fan-triangulate
        out->idx.push_back(poly[0]);
        out->idx.push_back(poly[i - 1]);
        out->idx.push_back(poly[i]);
      }
    }
  }
  if (out->idx.empty()) {
    set_err(err, "obj: no faces");
    return false;
  }
  if (!any_n) out->nrm.clear();
  if (!any_t) out->uv.clear();
  return true;
}

// ---------------------------------------------------------------- PLY ----

struct PlyProp {
  std::string name;
  int type;         // byte size 1/2/4/8 encoded with float flag
  bool is_float;
  bool is_list;
  int count_size;   // list count byte size
  bool count_unsigned;
};

int type_size(const std::string& t) {
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "int" || t == "uint" || t == "int32" || t == "uint32" ||
      t == "float" || t == "float32") return 4;
  if (t == "double" || t == "float64") return 8;
  return 0;
}
bool type_float(const std::string& t) {
  return t == "float" || t == "float32" || t == "double" || t == "float64";
}

double read_scalar(const uint8_t* p, int size, bool is_float) {
  if (is_float) {
    if (size == 4) { float v; std::memcpy(&v, p, 4); return v; }
    double v; std::memcpy(&v, p, 8); return v;
  }
  // little-endian signed/unsigned — sign doesn't matter for our ranges
  int64_t v = 0;
  std::memcpy(&v, p, size);
  return double(v);
}

bool load_ply(FILE* f, Mesh* out, char* err) {
  char line[4096];
  if (!std::fgets(line, sizeof line, f) ||
      std::strncmp(line, "ply", 3) != 0) {
    set_err(err, "ply: missing magic");
    return false;
  }
  bool binary = false, ascii = false;
  struct Elem { std::string name; long count; std::vector<PlyProp> props; };
  std::vector<Elem> elems;
  while (std::fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("comment", 0) == 0) continue;
    if (s.rfind("format", 0) == 0) {
      if (s.find("ascii") != std::string::npos) ascii = true;
      else if (s.find("binary_little_endian") != std::string::npos)
        binary = true;
      else { set_err(err, "ply: unsupported format (big-endian)"); return false; }
    } else if (s.rfind("element", 0) == 0) {
      char name[256]; long cnt;
      if (std::sscanf(s.c_str(), "element %255s %ld", name, &cnt) == 2)
        elems.push_back({name, cnt, {}});
    } else if (s.rfind("property", 0) == 0) {
      if (elems.empty()) continue;
      char t1[64], t2[64], t3[64], nm[256];
      if (std::sscanf(s.c_str(), "property list %63s %63s %255s",
                      t1, t2, nm) == 3) {
        PlyProp p;
        p.name = nm; p.is_list = true;
        p.count_size = type_size(t1);
        p.count_unsigned = true;
        p.type = type_size(t2);
        p.is_float = type_float(t2);
        elems.back().props.push_back(p);
      } else if (std::sscanf(s.c_str(), "property %63s %255s",
                             t3, nm) == 2) {
        PlyProp p;
        p.name = nm; p.is_list = false;
        p.type = type_size(t3);
        p.is_float = type_float(t3);
        p.count_size = 0; p.count_unsigned = false;
        elems.back().props.push_back(p);
      }
    } else if (s == "end_header") {
      break;
    }
  }
  if (!ascii && !binary) { set_err(err, "ply: no format line"); return false; }

  for (auto& e : elems) {
    bool is_vertex = e.name == "vertex";
    bool is_face = e.name == "face";
    // column indices for the props we consume
    int cx = -1, cy = -1, cz = -1, cnx = -1, cny = -1, cnz = -1,
        cu = -1, cv = -1, clist = -1;
    for (size_t i = 0; i < e.props.size(); ++i) {
      const auto& p = e.props[i];
      if (p.name == "x") cx = int(i);
      else if (p.name == "y") cy = int(i);
      else if (p.name == "z") cz = int(i);
      else if (p.name == "nx") cnx = int(i);
      else if (p.name == "ny") cny = int(i);
      else if (p.name == "nz") cnz = int(i);
      else if (p.name == "u" || p.name == "s" ||
               p.name == "texture_u") cu = int(i);
      else if (p.name == "v" || p.name == "t" ||
               p.name == "texture_v") cv = int(i);
      if (p.is_list && (p.name == "vertex_indices" ||
                        p.name == "vertex_index")) clist = int(i);
    }
    if (is_vertex && (cx < 0 || cy < 0 || cz < 0)) {
      set_err(err, "ply: vertex element lacks x/y/z");
      return false;
    }
    bool has_n = cnx >= 0 && cny >= 0 && cnz >= 0;
    bool has_t = cu >= 0 && cv >= 0;

    std::vector<double> row(e.props.size());
    std::vector<uint8_t> buf(64);
    for (long r = 0; r < e.count; ++r) {
      std::vector<long> list_vals;
      if (ascii) {
        for (size_t i = 0; i < e.props.size(); ++i) {
          const auto& p = e.props[i];
          if (p.is_list) {
            long cnt;
            if (std::fscanf(f, "%ld", &cnt) != 1) {
              set_err(err, "ply: truncated ascii list"); return false;
            }
            list_vals.resize(cnt);
            for (long k = 0; k < cnt; ++k)
              if (std::fscanf(f, "%ld", &list_vals[k]) != 1) {
                set_err(err, "ply: truncated ascii list"); return false;
              }
            row[i] = 0;
          } else {
            double v;
            if (std::fscanf(f, "%lf", &v) != 1) {
              set_err(err, "ply: truncated ascii row"); return false;
            }
            row[i] = v;
          }
        }
      } else {
        for (size_t i = 0; i < e.props.size(); ++i) {
          const auto& p = e.props[i];
          if (p.is_list) {
            if (std::fread(buf.data(), 1, p.count_size, f) !=
                size_t(p.count_size)) {
              set_err(err, "ply: truncated binary list count"); return false;
            }
            long cnt = long(read_scalar(buf.data(), p.count_size, false));
            list_vals.resize(cnt);
            for (long k = 0; k < cnt; ++k) {
              if (std::fread(buf.data(), 1, p.type, f) != size_t(p.type)) {
                set_err(err, "ply: truncated binary list"); return false;
              }
              list_vals[k] = long(read_scalar(buf.data(), p.type,
                                              p.is_float));
            }
            row[i] = 0;
          } else {
            if (std::fread(buf.data(), 1, p.type, f) != size_t(p.type)) {
              set_err(err, "ply: truncated binary row"); return false;
            }
            row[i] = read_scalar(buf.data(), p.type, p.is_float);
          }
        }
      }
      if (is_vertex) {
        out->pos.push_back(float(row[cx]));
        out->pos.push_back(float(row[cy]));
        out->pos.push_back(float(row[cz]));
        if (has_n) {
          out->nrm.push_back(float(row[cnx]));
          out->nrm.push_back(float(row[cny]));
          out->nrm.push_back(float(row[cnz]));
        }
        if (has_t) {
          out->uv.push_back(float(row[cu]));
          out->uv.push_back(float(row[cv]));
        }
      } else if (is_face && clist >= 0) {
        for (size_t k = 2; k < list_vals.size(); ++k) {
          out->idx.push_back(int32_t(list_vals[0]));
          out->idx.push_back(int32_t(list_vals[k - 1]));
          out->idx.push_back(int32_t(list_vals[k]));
        }
      }
    }
  }
  if (out->pos.empty() || out->idx.empty()) {
    set_err(err, "ply: no vertices or faces");
    return false;
  }
  long nv = long(out->pos.size() / 3);
  for (int32_t ix : out->idx)
    if (ix < 0 || ix >= nv) { set_err(err, "ply: index out of range");
                              return false; }
  return true;
}

}  // namespace

extern "C" {

// Returns 0 on success. Arrays are malloc'd; free with ort_free_mesh.
// has_normals/has_uvs are 0/1; when 0 the pointer is null.
int ort_load_mesh(const char* path,
                  float** out_pos, int32_t* n_verts,
                  int32_t** out_idx, int32_t* n_tris,
                  float** out_nrm, int32_t* has_normals,
                  float** out_uv, int32_t* has_uvs,
                  char* err /* >= 256 bytes, may be null */) {
  *out_pos = nullptr; *out_idx = nullptr; *out_nrm = nullptr;
  *out_uv = nullptr;
  *n_verts = 0; *n_tris = 0; *has_normals = 0; *has_uvs = 0;
  const char* dot = std::strrchr(path, '.');
  std::string ext = dot ? dot + 1 : "";
  for (auto& c : ext) c = char(std::tolower(c));

  FILE* f = std::fopen(path, "rb");
  if (!f) { set_err(err, std::string("cannot open ") + path); return 1; }
  Mesh m;
  bool ok = false;
  if (ext == "obj") ok = load_obj(f, &m, err);
  else if (ext == "ply") ok = load_ply(f, &m, err);
  else set_err(err, "unsupported extension: " + ext);
  std::fclose(f);
  if (!ok) return 1;

  *n_verts = int32_t(m.pos.size() / 3);
  *n_tris = int32_t(m.idx.size() / 3);
  *out_pos = (float*)std::malloc(m.pos.size() * sizeof(float));
  std::memcpy(*out_pos, m.pos.data(), m.pos.size() * sizeof(float));
  *out_idx = (int32_t*)std::malloc(m.idx.size() * sizeof(int32_t));
  std::memcpy(*out_idx, m.idx.data(), m.idx.size() * sizeof(int32_t));
  if (!m.nrm.empty() && m.nrm.size() == m.pos.size()) {
    *has_normals = 1;
    *out_nrm = (float*)std::malloc(m.nrm.size() * sizeof(float));
    std::memcpy(*out_nrm, m.nrm.data(), m.nrm.size() * sizeof(float));
  }
  if (!m.uv.empty() && m.uv.size() / 2 == m.pos.size() / 3) {
    *has_uvs = 1;
    *out_uv = (float*)std::malloc(m.uv.size() * sizeof(float));
    std::memcpy(*out_uv, m.uv.data(), m.uv.size() * sizeof(float));
  }
  return 0;
}

void ort_free_mesh(float* pos, int32_t* idx, float* nrm, float* uv) {
  std::free(pos); std::free(idx); std::free(nrm); std::free(uv);
}

}  // extern "C"

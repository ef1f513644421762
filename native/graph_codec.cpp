// Native binary graph (map) codec.
//
// The reference persists maps through rosbag2 serialization
// (/root/reference/src/graph.cpp:49-165).  This codec is the runtime-native
// replacement: a single flat binary file holding all keyframes and
// constraints, written/read with large sequential I/O (orders of magnitude
// faster than npz for big maps, no Python in the hot path).
//
// Layout (little-endian):
//   magic "NDT2"  | uint32 version | int32 num_scans | int32 max_points
//   int32 num_constraints
//   poses      float64 [num_scans, 3]
//   points     float32 [num_scans, max_points, 2]
//   point_mask uint8   [num_scans, max_points]
//   begin/end  int32   [num_constraints] each
//   transform  float64 [num_constraints, 3]
//   information float64 [num_constraints, 9]
//   switchable uint8   [num_constraints]

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {
constexpr char kMagic[4] = {'N', 'D', 'T', '2'};
constexpr uint32_t kVersion = 1;

bool write_all(FILE* f, const void* p, size_t bytes) {
  return std::fwrite(p, 1, bytes, f) == bytes;
}
bool read_all(FILE* f, void* p, size_t bytes) {
  return std::fread(p, 1, bytes, f) == bytes;
}
}  // namespace

extern "C" {

int ndt2d_save_graph(const char* path, int num_scans, int max_points,
                     const double* poses, const float* points,
                     const uint8_t* point_mask, int num_constraints,
                     const int32_t* begin, const int32_t* end,
                     const double* transform, const double* information,
                     const uint8_t* switchable) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  bool ok = write_all(f, kMagic, 4) && write_all(f, &kVersion, 4) &&
            write_all(f, &num_scans, 4) && write_all(f, &max_points, 4) &&
            write_all(f, &num_constraints, 4);
  const size_t s = static_cast<size_t>(num_scans);
  const size_t p = static_cast<size_t>(max_points);
  const size_t c = static_cast<size_t>(num_constraints);
  ok = ok && write_all(f, poses, s * 3 * sizeof(double));
  ok = ok && write_all(f, points, s * p * 2 * sizeof(float));
  ok = ok && write_all(f, point_mask, s * p);
  ok = ok && write_all(f, begin, c * sizeof(int32_t));
  ok = ok && write_all(f, end, c * sizeof(int32_t));
  ok = ok && write_all(f, transform, c * 3 * sizeof(double));
  ok = ok && write_all(f, information, c * 9 * sizeof(double));
  ok = ok && write_all(f, switchable, c);
  std::fclose(f);
  return ok ? 0 : -2;
}

int ndt2d_graph_header(const char* path, int* num_scans, int* max_points,
                       int* num_constraints) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version = 0;
  bool ok = read_all(f, magic, 4) && read_all(f, &version, 4) &&
            read_all(f, num_scans, 4) && read_all(f, max_points, 4) &&
            read_all(f, num_constraints, 4);
  std::fclose(f);
  if (!ok || std::memcmp(magic, kMagic, 4) != 0) return -2;
  if (version != kVersion) return -3;
  return 0;
}

int ndt2d_load_graph(const char* path, double* poses, float* points,
                     uint8_t* point_mask, int32_t* begin, int32_t* end,
                     double* transform, double* information,
                     uint8_t* switchable) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version = 0;
  int num_scans = 0, max_points = 0, num_constraints = 0;
  bool ok = read_all(f, magic, 4) && read_all(f, &version, 4) &&
            read_all(f, &num_scans, 4) && read_all(f, &max_points, 4) &&
            read_all(f, &num_constraints, 4);
  if (!ok || std::memcmp(magic, kMagic, 4) != 0 || version != kVersion) {
    std::fclose(f);
    return -2;
  }
  const size_t s = static_cast<size_t>(num_scans);
  const size_t p = static_cast<size_t>(max_points);
  const size_t c = static_cast<size_t>(num_constraints);
  ok = read_all(f, poses, s * 3 * sizeof(double));
  ok = ok && read_all(f, points, s * p * 2 * sizeof(float));
  ok = ok && read_all(f, point_mask, s * p);
  ok = ok && read_all(f, begin, c * sizeof(int32_t));
  ok = ok && read_all(f, end, c * sizeof(int32_t));
  ok = ok && read_all(f, transform, c * 3 * sizeof(double));
  ok = ok && read_all(f, information, c * 9 * sizeof(double));
  ok = ok && read_all(f, switchable, c);
  std::fclose(f);
  return ok ? 0 : -3;
}

}  // extern "C"

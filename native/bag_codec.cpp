// Native binary scan-bag codec.
//
// The reference's data format for everything is rosbag2
// (/root/reference/src/graph.cpp:49-165); our scan logs ("bags") get the
// same runtime-native treatment as maps (graph_codec.cpp): one flat binary
// file, large sequential reads/writes, no Python in the hot path.  This is
// the framework's data-loader format for high-rate scan streams.
//
// Layout (little-endian):
//   magic "NDTB" | uint32 version
//   int32 num_scans | int32 num_beams | uint8 has_truth
//   double angle_min | double angle_increment | double time_increment
//   double range_max
//   ranges float32 [num_scans, num_beams]   (NaN = invalid beam)
//   odom   float64 [num_scans, 3]
//   truth  float64 [num_scans, 3]           (only if has_truth)

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {
constexpr char kMagic[4] = {'N', 'D', 'T', 'B'};
constexpr uint32_t kVersion = 1;

bool write_all(FILE* f, const void* p, size_t bytes) {
  return std::fwrite(p, 1, bytes, f) == bytes;
}
bool read_all(FILE* f, void* p, size_t bytes) {
  return std::fread(p, 1, bytes, f) == bytes;
}
}  // namespace

extern "C" {

int ndt2d_save_bag(const char* path, int num_scans, int num_beams,
                   uint8_t has_truth, double angle_min,
                   double angle_increment, double time_increment,
                   double range_max, const float* ranges, const double* odom,
                   const double* truth) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  bool ok = write_all(f, kMagic, 4) && write_all(f, &kVersion, 4) &&
            write_all(f, &num_scans, 4) && write_all(f, &num_beams, 4) &&
            write_all(f, &has_truth, 1) && write_all(f, &angle_min, 8) &&
            write_all(f, &angle_increment, 8) &&
            write_all(f, &time_increment, 8) && write_all(f, &range_max, 8);
  const size_t t = static_cast<size_t>(num_scans);
  const size_t n = static_cast<size_t>(num_beams);
  ok = ok && write_all(f, ranges, t * n * sizeof(float));
  ok = ok && write_all(f, odom, t * 3 * sizeof(double));
  if (has_truth) ok = ok && write_all(f, truth, t * 3 * sizeof(double));
  std::fclose(f);
  return ok ? 0 : -2;
}

int ndt2d_bag_header(const char* path, int* num_scans, int* num_beams,
                     uint8_t* has_truth, double* angle_min,
                     double* angle_increment, double* time_increment,
                     double* range_max) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version = 0;
  bool ok = read_all(f, magic, 4) && read_all(f, &version, 4) &&
            read_all(f, num_scans, 4) && read_all(f, num_beams, 4) &&
            read_all(f, has_truth, 1) && read_all(f, angle_min, 8) &&
            read_all(f, angle_increment, 8) &&
            read_all(f, time_increment, 8) && read_all(f, range_max, 8);
  std::fclose(f);
  if (!ok || std::memcmp(magic, kMagic, 4) != 0) return -2;
  if (version != kVersion) return -3;
  return 0;
}

int ndt2d_load_bag(const char* path, float* ranges, double* odom,
                   double* truth) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[4];
  uint32_t version = 0;
  int num_scans = 0, num_beams = 0;
  uint8_t has_truth = 0;
  double skip[4];
  bool ok = read_all(f, magic, 4) && read_all(f, &version, 4) &&
            read_all(f, &num_scans, 4) && read_all(f, &num_beams, 4) &&
            read_all(f, &has_truth, 1) && read_all(f, skip, 32);
  if (!ok || std::memcmp(magic, kMagic, 4) != 0 || version != kVersion) {
    std::fclose(f);
    return -2;
  }
  const size_t t = static_cast<size_t>(num_scans);
  const size_t n = static_cast<size_t>(num_beams);
  ok = read_all(f, ranges, t * n * sizeof(float));
  ok = ok && read_all(f, odom, t * 3 * sizeof(double));
  if (has_truth && truth) ok = ok && read_all(f, truth, t * 3 * sizeof(double));
  std::fclose(f);
  return ok ? 0 : -3;
}

}  // extern "C"

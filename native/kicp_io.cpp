// Native ingestion kernels for kinematic_icp_tpu.
//
// The reference's runtime layers are C++ (core odometry + the ROS glue that
// converts PointCloud2 buffers, ros/src/kinematic_icp_ros/utils/RosUtils.cpp
// and TimeStampHandler.cpp).  Here the device compute path is XLA-compiled;
// this library provides the native host-side hot loops of the ingestion
// layer: strided PointCloud2 field extraction into planar arrays, per-point
// timestamp decode with nanosecond auto-scaling, and LaserScan projection.
// Bound via ctypes (kinematic_icp_tpu/utils/io/native.py) with a pure-numpy
// fallback.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// PointField datatype codes (sensor_msgs/PointField.msg)
enum FieldType : int32_t {
  INT8 = 1, UINT8 = 2, INT16 = 3, UINT16 = 4,
  INT32 = 5, UINT32 = 6, FLOAT32 = 7, FLOAT64 = 8,
};

inline double read_field(const uint8_t* p, int32_t dtype) {
  switch (dtype) {
    case INT8: return static_cast<double>(*reinterpret_cast<const int8_t*>(p));
    case UINT8: return static_cast<double>(*p);
    case INT16: { int16_t v; std::memcpy(&v, p, 2); return v; }
    case UINT16: { uint16_t v; std::memcpy(&v, p, 2); return v; }
    case INT32: { int32_t v; std::memcpy(&v, p, 4); return v; }
    case UINT32: { uint32_t v; std::memcpy(&v, p, 4); return v; }
    case FLOAT32: { float v; std::memcpy(&v, p, 4); return v; }
    case FLOAT64: { double v; std::memcpy(&v, p, 8); return v; }
    default: return 0.0;
  }
}

}  // namespace

extern "C" {

// Extract x/y/z (+ optional timestamp) fields from a PointCloud2 data blob
// into planar float32 arrays + a float64 timestamp array.
// t_offset < 0 => no timestamp field; returns the number of points written.
// Timestamps whose integer part exceeds 10 digits are treated as nanoseconds
// and rescaled to seconds (TimeStampHandler.cpp:38-55 parity).
int64_t kicp_extract_pointcloud(
    const uint8_t* data, int64_t n_points, int32_t point_step,
    int32_t x_offset, int32_t y_offset, int32_t z_offset, int32_t xyz_dtype,
    int32_t t_offset, int32_t t_dtype,
    float* out_x, float* out_y, float* out_z, double* out_t) {
  const bool fast_f32 = (xyz_dtype == FLOAT32);
  for (int64_t i = 0; i < n_points; ++i) {
    const uint8_t* p = data + i * point_step;
    if (fast_f32) {
      float x, y, z;
      std::memcpy(&x, p + x_offset, 4);
      std::memcpy(&y, p + y_offset, 4);
      std::memcpy(&z, p + z_offset, 4);
      out_x[i] = x; out_y[i] = y; out_z[i] = z;
    } else {
      out_x[i] = static_cast<float>(read_field(p + x_offset, xyz_dtype));
      out_y[i] = static_cast<float>(read_field(p + y_offset, xyz_dtype));
      out_z[i] = static_cast<float>(read_field(p + z_offset, xyz_dtype));
    }
    if (t_offset >= 0) {
      double t = read_field(p + t_offset, t_dtype);
      const uint64_t secs = static_cast<uint64_t>(std::llround(t));
      int digits = 1;
      for (uint64_t s = secs; s >= 10; s /= 10) ++digits;
      if (secs > 0 && digits > 10) t *= 1e-9;
      out_t[i] = t;
    }
  }
  return n_points;
}

// Project a LaserScan to planar xyz + per-beam relative timestamps,
// filtering invalid ranges (laser_geometry parity, online_node.cpp:45-58).
// Returns the number of valid points written.
int64_t kicp_project_laserscan(
    const float* ranges, int64_t n, float angle_min, float angle_increment,
    float time_increment, float range_min, float range_max,
    float* out_x, float* out_y, float* out_t) {
  int64_t m = 0;
  for (int64_t i = 0; i < n; ++i) {
    const float r = ranges[i];
    if (!(r >= range_min && r <= range_max)) continue;  // NaN/inf fail too
    const float a = angle_min + static_cast<float>(i) * angle_increment;
    out_x[m] = r * std::cos(a);
    out_y[m] = r * std::sin(a);
    out_t[m] = static_cast<float>(i) * time_increment;
    ++m;
  }
  return m;
}

// Pad/copy planar points into a fixed-size bucket (mask semantics of the
// device pipeline): returns the number of valid rows (min(n, bucket)).
int64_t kicp_pad_bucket(
    const float* x, const float* y, const float* z, const float* t,
    int64_t n, int64_t bucket,
    float* out_x, float* out_y, float* out_z, float* out_t,
    uint8_t* out_mask) {
  const int64_t k = n < bucket ? n : bucket;
  std::memcpy(out_x, x, k * sizeof(float));
  std::memcpy(out_y, y, k * sizeof(float));
  std::memcpy(out_z, z, k * sizeof(float));
  if (t != nullptr && out_t != nullptr) std::memcpy(out_t, t, k * sizeof(float));
  std::memset(out_mask, 1, k);
  if (bucket > k) {
    std::memset(out_x + k, 0, (bucket - k) * sizeof(float));
    std::memset(out_y + k, 0, (bucket - k) * sizeof(float));
    std::memset(out_z + k, 0, (bucket - k) * sizeof(float));
    if (out_t != nullptr) std::memset(out_t + k, 0, (bucket - k) * sizeof(float));
    std::memset(out_mask + k, 0, bucket - k);
  }
  return k;
}

}  // extern "C"

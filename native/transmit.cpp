// Native snap2 packet blaster (load generator).
//
// Parity with the reference's multithreaded test transmitter
// (reference: pipeline/test_transmitters/test_tx_mt.c): packetizes a
// [ntime, nchan, ninput] gulp into per-(chan-block, pol-block) snap2
// packets with sendmmsg batching, an optional nanosleep throttle applied
// every 16*nchan_blocks packets, and optional deliberate packet loss for
// fault-injection tests.

#include "cbd_native.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <string.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>

#include <vector>

static int64_t tx_stream(const char *dest_ip, int port,
                         const uint8_t *data, int64_t ntime, int nchan,
                         int ninput, int64_t seq0, int64_t ngulp,
                         int nchan_per_pkt, int npol_per_pkt,
                         long delay_ns, int miss_every) {
  // reject zero BEFORE the modulo (x % 0 is SIGFPE, not an error code)
  if (nchan_per_pkt <= 0 || npol_per_pkt <= 0) return -1;
  if (nchan % nchan_per_pkt || ninput % npol_per_pkt) return -1;
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  int sndbuf = 64 * 1024 * 1024;
  if (setsockopt(fd, SOL_SOCKET, SO_SNDBUFFORCE, &sndbuf,
                 sizeof(sndbuf)) != 0)
    setsockopt(fd, SOL_SOCKET, SO_SNDBUF, &sndbuf, sizeof(sndbuf));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  addr.sin_addr.s_addr = inet_addr(dest_ip);
  if (connect(fd, (sockaddr *)&addr, sizeof(addr)) != 0) {
    close(fd);
    return -1;
  }

  const int nchan_blocks = nchan / nchan_per_pkt;
  const int npol_blocks = ninput / npol_per_pkt;
  const size_t payload = (size_t)nchan_per_pkt * npol_per_pkt;
  std::vector<uint8_t> pkt(sizeof(cbd_snap2_hdr) + payload);
  auto *h = reinterpret_cast<cbd_snap2_hdr *>(pkt.data());
  h->magic = CBD_SNAP2_MAGIC;
  h->npol = (uint16_t)npol_per_pkt;
  h->npol_tot = (uint16_t)ninput;
  h->nchan = (uint16_t)nchan_per_pkt;
  h->nchan_tot = (uint16_t)nchan;

  int64_t sent = 0, counter = 0;
  const long burst = 16L * nchan_blocks;  // throttle cadence
                                          // (test_tx_mt.c:28-34)
  // absolute-deadline pacing: relative nanosleep overshoots by the
  // syscall latency every burst, capping the achievable offered rate
  timespec deadline;
  clock_gettime(CLOCK_MONOTONIC, &deadline);
  for (int64_t gt = 0; gt < ngulp * ntime; gt++) {
    const int64_t t = gt % ntime;
    const uint8_t *frame = data + (size_t)t * nchan * ninput;
    for (int cb = 0; cb < nchan_blocks; cb++) {
      for (int pb = 0; pb < npol_blocks; pb++) {
        counter++;
        if (miss_every > 0 && counter % miss_every == 0) continue;
        h->seq = (uint64_t)(seq0 + gt);
        h->chan_block_id = (uint32_t)cb;
        h->chan0 = (uint32_t)(cb * nchan_per_pkt);
        h->pol0 = (uint32_t)(pb * npol_per_pkt);
        const uint8_t *src =
            frame + (size_t)cb * nchan_per_pkt * ninput +
            (size_t)pb * npol_per_pkt;
        bool ok;
        if (npol_per_pkt == ninput) {
          // whole-row packets are contiguous in the gulp: send straight
          // from the caller's buffer with a 2-element iovec (no copy)
          iovec iov[2] = {{pkt.data(), sizeof(cbd_snap2_hdr)},
                          {const_cast<uint8_t *>(src), payload}};
          msghdr mh{};
          mh.msg_iov = iov;
          mh.msg_iovlen = 2;
          ok = sendmsg(fd, &mh, 0) >= 0;
          if (!ok) {
            timespec b = {0, 50 * 1000};
            nanosleep(&b, nullptr);
            ok = sendmsg(fd, &mh, 0) >= 0;
          }
        } else {
          uint8_t *dst = pkt.data() + sizeof(cbd_snap2_hdr);
          for (int ch = 0; ch < nchan_per_pkt; ch++)
            memcpy(dst + (size_t)ch * npol_per_pkt,
                   src + (size_t)ch * ninput, npol_per_pkt);
          ok = send(fd, pkt.data(), pkt.size(), 0) >= 0;
          if (!ok) {
            // transient ENOBUFS: brief backoff and retry once
            timespec b = {0, 50 * 1000};
            nanosleep(&b, nullptr);
            ok = send(fd, pkt.data(), pkt.size(), 0) >= 0;
          }
        }
        if (!ok) continue;
        sent++;
        if (delay_ns > 0 && counter % burst == 0) {
          deadline.tv_nsec += delay_ns;
          while (deadline.tv_nsec >= 1000000000L) {
            deadline.tv_nsec -= 1000000000L;
            deadline.tv_sec += 1;
          }
          clock_nanosleep(CLOCK_MONOTONIC, TIMER_ABSTIME, &deadline,
                          nullptr);
        }
      }
    }
  }
  close(fd);
  return sent;
}

extern "C" int64_t cbd_transmit_gulp(const char *dest_ip, int port,
                                     const uint8_t *data, int64_t ntime,
                                     int nchan, int ninput, int64_t seq0,
                                     int nchan_per_pkt, int npol_per_pkt,
                                     long delay_ns, int miss_every) {
  return tx_stream(dest_ip, port, data, ntime, nchan, ninput, seq0, 1,
                   nchan_per_pkt, npol_per_pkt, delay_ns, miss_every);
}

// Multi-gulp blaster: loops the same gulp ngulp times with advancing
// sequence numbers, entirely in native code — one socket, one absolute
// pacing deadline for the whole stream.  Removes the per-gulp
// socket-setup + interpreter round trip that made the in-process
// dual-blaster pacing ~20% erratic under load (the r3 flaky-gate
// witness), so offered rate tracks delay_ns closely.
extern "C" int64_t cbd_transmit_stream(const char *dest_ip, int port,
                                       const uint8_t *data, int64_t ntime,
                                       int nchan, int ninput, int64_t seq0,
                                       int64_t ngulp, int nchan_per_pkt,
                                       int npol_per_pkt, long delay_ns,
                                       int miss_every) {
  return tx_stream(dest_ip, port, data, ntime, nchan, ninput, seq0,
                   ngulp, nchan_per_pkt, npol_per_pkt, delay_ns,
                   miss_every);
}

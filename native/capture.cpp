// Native snap2 UDP capture engine.
//
// TPU-native equivalent of the reference's C++ packet-capture layer
// (bifrost UDPCapture, contract described in SURVEY.md section 2.2):
// a dedicated RX thread drains the socket with recvmmsg, validates snap2
// headers and scatters payloads into gulp-shaped [time, chan, input]
// slots of a lock-light ring.  The consumer thread copies out completed
// gulps; slots are emitted either when every expected packet landed or
// when the stream has advanced past them (late/lost packets leave zeroed
// holes, counted in nmissing -- the reference engine's behavior on loss).

#include "capture_impl.h"

#include <arpa/inet.h>
#include <netinet/in.h>
#include <string.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>

#include <cstdio>
#include <cstdlib>

namespace {

constexpr int kBatch = 64;          // recvmmsg batch
constexpr int kMaxPkt = 65536;      // UDP max (loopback / GRO paths can
                                    // exceed the 9k jumbo-frame size)

// consecutive backward packets required before a resync wipes the ring
// (both front ends funnel through cbd_capture_process_locked)
constexpr int kBackwardHysteresis = 4;

}  // namespace

// Zero every packet region whose landing bit is unset (bitmap-mode hole
// fill).  Used at emit time on the consumer's copy and at the
// mixed-geometry transition on in-flight slots.
void cbd_capture_zero_holes(const CbdCapture *c, uint8_t *data,
                            const uint64_t *filled) {
  int pkn = c->pkt_nchan, pkp = c->pkt_npol;
  if (!pkn || !pkp) return;
  uint32_t expected = c->expected_pkts_per_gulp;
  int pb_n = c->ninput / pkp;
  int cb_n = c->nchan / pkn;
  for (uint32_t b = 0; b < expected; b++) {
    if (filled[b / 64] & (1ull << (b % 64))) continue;
    uint32_t pol_blk = b % pb_n;
    uint32_t rest = b / pb_n;
    uint32_t chan_blk = rest % cb_n;
    uint32_t t = rest / cb_n;
    uint8_t *dst = data +
        ((size_t)t * c->nchan + (size_t)chan_blk * pkn) * c->ninput +
        (size_t)pol_blk * pkp;
    if (pkp == c->ninput)
      memset(dst, 0, (size_t)pkn * pkp);
    else
      for (int ch = 0; ch < pkn; ch++)
        memset(dst + (size_t)ch * c->ninput, 0, pkp);
  }
}

static void rx_loop(CbdCapture *c) {
  std::vector<std::vector<uint8_t>> bufs(kBatch,
                                         std::vector<uint8_t>(kMaxPkt));
  std::vector<mmsghdr> msgs(kBatch);
  std::vector<iovec> iovs(kBatch);
  for (int i = 0; i < kBatch; i++) {
    iovs[i] = {bufs[i].data(), bufs[i].size()};
    memset(&msgs[i], 0, sizeof(mmsghdr));
    msgs[i].msg_hdr.msg_iov = &iovs[i];
    msgs[i].msg_hdr.msg_iovlen = 1;
  }
  // NB: recvmmsg's timeout argument is only checked after at least one
  // datagram arrives (Linux quirk); shutdown wake-up relies on the
  // socket's SO_RCVTIMEO set at creation.
  while (c->running.load(std::memory_order_relaxed)) {
    int n = recvmmsg(c->fd, msgs.data(), kBatch, MSG_WAITFORONE, nullptr);
    if (n <= 0) continue;
    std::lock_guard<std::mutex> lk(c->mu);
    for (int i = 0; i < n; i++)
      cbd_capture_process_locked(c, bufs[i].data(), msgs[i].msg_len);
    c->cv.notify_all();
  }
  c->cv.notify_all();
}

// Validate one snap2 datagram and scatter its payload into the slot
// ring (shared by the recvmmsg and AF_XDP front ends; caller holds mu).
void cbd_capture_process_locked(CbdCapture *c, const uint8_t *pkt,
                                size_t len) {
  if (len < sizeof(cbd_snap2_hdr)) return;
  auto *h = reinterpret_cast<const cbd_snap2_hdr *>(pkt);
  if (h->magic != CBD_SNAP2_MAGIC) return;
  if ((int)h->nchan_tot != c->nchan || (int)h->npol_tot != c->ninput)
    return;
  // zero or non-divisor geometry would divide by zero below (SIGFPE
  // from one malformed datagram) or corrupt the bitmap geometry
  if (h->nchan == 0 || h->npol == 0 ||
      c->nchan % h->nchan || c->ninput % h->npol)
    return;
  // a sequence number with the top bit set turns into a negative
  // gulp index: negative slot_for() modulo and a destination pointer
  // BEFORE the slot buffer (heap corruption from one spoofed packet)
  if ((int64_t)h->seq < 0) return;
  size_t payload = (size_t)h->nchan * h->npol;
  if (len < sizeof(cbd_snap2_hdr) + payload) return;
  if (c->expected_pkts_per_gulp == 0) {
    c->expected_pkts_per_gulp =
        (uint32_t)((c->nchan / h->nchan) * (c->ninput / h->npol) *
                   c->ntime_gulp);
    c->pkt_nchan = h->nchan;
    c->pkt_npol = h->npol;
    size_t words = (c->expected_pkts_per_gulp + 63) / 64;
    for (auto &sl : c->slots) sl.filled.assign(words, 0);
    c->scratch_filled.assign(words, 0);
  } else if (!c->mixed_geometry &&
             ((int)h->nchan != c->pkt_nchan ||
              (int)h->npol != c->pkt_npol)) {
    c->mixed_geometry = true;  // revert to claim-time zeroing
    // slots claimed under bitmap mode were never zeroed and their
    // emit-time hole fill is now disabled: zero just the unfilled
    // packet regions (per each slot's landing bitmap) so stale
    // bytes cannot leak while already-landed payloads survive
    for (auto &sl : c->slots)
      if (sl.gulp_id >= 0 && !sl.ready)
        cbd_capture_zero_holes(c, sl.data.data(), sl.filled.data());
  }
  if (!c->mixed_geometry && c->pkt_npol &&
      (int)h->pol0 % c->pkt_npol != 0)
    return;  // would alias another packet's landing bit; dropping
               // keeps the bitmap (and hole-zeroing) truthful
  int64_t seq = (int64_t)h->seq;
  // Sequence-break detection: a jump of more than a few gulps starts
  // a new sequence (the reference C engine's discontinuity rule) and
  // fast-forwards the emit cursor — the stream resumes at the new
  // position instead of flooding zero-filled gap gulps.
  if (c->last_seq >= 0 &&
      (seq < c->last_seq - c->ntime_gulp ||
       seq > c->last_seq + 4 * c->ntime_gulp)) {
    if (seq > c->last_seq + 4 * c->ntime_gulp) {
      c->backward_streak = 0;
      c->nseq.fetch_add(1, std::memory_order_relaxed);
      // record the void so the consumer skips it after draining the
      // still-unread pre-gap gulps.  A SECOND break before the first
      // void was consumed extends the existing window to the newest
      // jump target (bounded loss of the in-between gulps) — never
      // narrows it, which would flood zero gulps for the first void.
      if (c->skip_from < 0)
        c->skip_from = c->last_seq / c->ntime_gulp + 1;
      c->skip_to = seq / c->ntime_gulp;
    } else {
      // BACKWARD jump: the transmitter restarted at a lower sequence
      // (FPGA resync).  The emit cursor must rewind or every packet
      // of the new stream is "too late" and the capture goes
      // permanently deaf.  But a SINGLE backward packet can also be a
      // reordered/duplicated straggler or one spoofed datagram —
      // wiping the ring for it would cost up to nbuf in-flight gulps.
      // Hysteresis: only resync after kBackwardHysteresis consecutive
      // backward packets (a genuine restart delivers thousands per
      // second); isolated stragglers are dropped as late, as the
      // pre-rewind engine always did.
      if (++c->backward_streak < kBackwardHysteresis) return;
      c->backward_streak = 0;
      c->nseq.fetch_add(1, std::memory_order_relaxed);
      // Drop unemitted old-stream slots and relearn the cursor from
      // this packet.
      for (auto &sl : c->slots) {
        if (sl.gulp_id >= 0 && !sl.ready && sl.npkt > 0 &&
            c->expected_pkts_per_gulp > sl.npkt)
          c->nmissing.fetch_add(c->expected_pkts_per_gulp - sl.npkt,
                                std::memory_order_relaxed);
        sl.gulp_id = -1;
        sl.npkt = 0;
        sl.ready = false;
        if (c->mixed_geometry)
          memset(sl.data.data(), 0, sl.data.size());
        else
          std::fill(sl.filled.begin(), sl.filled.end(), 0);
      }
      c->emit_next = -1;
      c->highest_gulp = -1;
      c->skip_from = c->skip_to = -1;
    }
  } else {
    c->backward_streak = 0;  // in-order packet ends any straggler run
  }
  if (c->last_seq < 0) c->nseq.fetch_add(1, std::memory_order_relaxed);
  c->last_seq = seq;

  int64_t gulp_id = seq / c->ntime_gulp;
  if (c->emit_next < 0) c->emit_next = gulp_id;
  if (gulp_id < c->emit_next) return;  // too late, already emitted
  CbdSlot &s = c->slot_for(gulp_id);
  if (s.gulp_id != gulp_id) {
    if (s.gulp_id >= c->emit_next && s.npkt > 0 && !s.ready) {
      // overwriting a not-yet-emitted slot: stream advanced by more
      // than the ring depth and the whole gulp is lost to the
      // consumer.  Account it ONLY when this slot is the emit head
      // (which we advance past — the consumer never sees it); any
      // other slot is counted once by the fully-missing emission
      // path when the consumer reaches it, and counting here too
      // would double the loss statistics the rate gates assert on.
      if (c->emit_next == s.gulp_id) {
        if (c->expected_pkts_per_gulp)
          c->nmissing.fetch_add(c->expected_pkts_per_gulp,
                                std::memory_order_relaxed);
        c->emit_next = s.gulp_id + 1;
      }
    }
    s.gulp_id = gulp_id;
    s.npkt = 0;
    s.ready = false;
    if (c->mixed_geometry)
      memset(s.data.data(), 0, s.data.size());
    else
      std::fill(s.filled.begin(), s.filled.end(), 0);
  }
  int t = (int)(seq - gulp_id * c->ntime_gulp);
  size_t chan_off = (size_t)h->chan_block_id * h->nchan;
  if (chan_off + h->nchan > (size_t)c->nchan) return;
  if ((size_t)h->pol0 + h->npol > (size_t)c->ninput) return;
  const uint8_t *src = pkt + sizeof(cbd_snap2_hdr);
  uint8_t *dst = s.data.data() +
                 ((size_t)t * c->nchan + chan_off) * c->ninput +
                 h->pol0;
  if ((int)h->npol == c->ninput) {
    // whole-row packets: one contiguous copy
    memcpy(dst, src, payload);
  } else {
    for (int ch = 0; ch < h->nchan; ch++)
      memcpy(dst + (size_t)ch * c->ninput,
             src + (size_t)ch * h->npol, h->npol);
  }
  if (!c->mixed_geometry) {
    size_t pidx = ((size_t)t * (c->nchan / c->pkt_nchan) +
                   h->chan_block_id) * (c->ninput / c->pkt_npol) +
                  h->pol0 / c->pkt_npol;
    uint64_t bit = 1ull << (pidx % 64);
    // duplicates must not advance npkt: readiness is derived from
    // npkt == expected, and a dup-inflated count would mark an
    // incomplete gulp ready and skip its hole-zeroing
    if (!(s.filled[pidx / 64] & bit)) {
      s.filled[pidx / 64] |= bit;
      s.npkt++;
    }
  } else {
    s.npkt++;
  }
  c->npkt.fetch_add(1, std::memory_order_relaxed);
  c->ngood_bytes.fetch_add(payload, std::memory_order_relaxed);
  if (gulp_id > c->highest_gulp) c->highest_gulp = gulp_id;
  // mixed geometry: expected_pkts_per_gulp was learned from the
  // FIRST geometry and no longer predicts completeness (and without
  // the landing bitmap a duplicate inflates npkt) — never derive
  // readiness from the count there; emission falls back to the
  // lead-distance rule, and claim-time zeroing covers the holes
  if (!c->mixed_geometry && s.npkt == c->expected_pkts_per_gulp)
    s.ready = true;
}

extern "C" {

CbdCapture *cbd_capture_create(const char *bind_ip, int port, int nchan,
                               int ninput, int ntime_gulp, int nbuf) {
  auto *c = new CbdCapture();
  c->nbuf = nbuf < 2 ? 2 : nbuf;  // clamp BEFORE deriving lead: nbuf<=1
                                  // would give lead<=0 and emit gulps
                                  // while their packets still arrive
  c->lead = c->nbuf > 4 ? 2 : c->nbuf - 1;
  c->nchan = nchan;
  c->ninput = ninput;
  c->ntime_gulp = ntime_gulp;
  c->gulp_nbyte = (size_t)ntime_gulp * nchan * ninput;
  c->slots.resize(c->nbuf);
  for (auto &s : c->slots) s.data.assign(c->gulp_nbyte, 0);
  c->scratch.assign(c->gulp_nbyte, 0);

  c->fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (c->fd < 0) { delete c; return nullptr; }
  int rcvbuf = 256 * 1024 * 1024;
  // FORCE variant (root) ignores rmem_max — the deep kernel buffer is
  // the burst absorber the reference gets from IB verbs queue depth
  if (setsockopt(c->fd, SOL_SOCKET, SO_RCVBUFFORCE, &rcvbuf,
                 sizeof(rcvbuf)) != 0)
    setsockopt(c->fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
  timeval rcvto = {0, 100 * 1000};  // 100 ms: lets the RX loop observe stop
  setsockopt(c->fd, SOL_SOCKET, SO_RCVTIMEO, &rcvto, sizeof(rcvto));
  int reuse = 1;
  setsockopt(c->fd, SOL_SOCKET, SO_REUSEADDR, &reuse, sizeof(reuse));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  addr.sin_addr.s_addr =
      bind_ip && *bind_ip ? inet_addr(bind_ip) : INADDR_ANY;
  if (bind(c->fd, (sockaddr *)&addr, sizeof(addr)) != 0) {
    close(c->fd);
    delete c;
    return nullptr;
  }
  return c;
}

int cbd_capture_start(CbdCapture *c) {
  if (!c || c->running.load()) return -1;
  c->running.store(true);
  c->rx = std::thread(c->xsk ? cbd_xsk_rx_loop : rx_loop, c);
  return 0;
}

// AF_XDP variant: same slot ring / emission semantics, kernel-bypass
// RX front end (the reference's UDPVerbsCapture analog,
// capture_block.py:180-189).  Returns nullptr when AF_XDP setup fails
// (kernel without XDP, no CAP_NET_ADMIN, jumbo frames without
// multi-buffer); callers fall back to the recvmmsg engine.
CbdCapture *cbd_capture_create_xdp(const char *ifname, int queue_id,
                                   int port, int nchan, int ninput,
                                   int ntime_gulp, int nbuf) {
  auto *c = new CbdCapture();
  c->nbuf = nbuf < 2 ? 2 : nbuf;  // clamp before lead (see above)
  c->lead = c->nbuf > 4 ? 2 : c->nbuf - 1;
  c->nchan = nchan;
  c->ninput = ninput;
  c->ntime_gulp = ntime_gulp;
  c->gulp_nbyte = (size_t)ntime_gulp * nchan * ninput;
  c->slots.resize(c->nbuf);
  for (auto &s : c->slots) s.data.assign(c->gulp_nbyte, 0);
  c->scratch.assign(c->gulp_nbyte, 0);
  c->xsk = cbd_xsk_create(ifname, queue_id, port);
  if (!c->xsk) {
    delete c;
    return nullptr;
  }
  return c;
}

int64_t cbd_capture_get_gulp(CbdCapture *c, uint8_t *out,
                             double timeout_s) {
  if (!c) return -1;
  std::unique_lock<std::mutex> lk(c->mu);
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::duration_cast<std::chrono::nanoseconds>(
                      std::chrono::duration<double>(timeout_s));
  for (;;) {
    if (c->skip_from >= 0 && c->emit_next >= c->skip_from &&
        c->emit_next < c->skip_to) {
      // sequence break: jump the void between the old and new streams
      c->emit_next = c->skip_to;
      c->skip_from = c->skip_to = -1;
    }
    if (c->emit_next >= 0) {
      CbdSlot &s = c->slot_for(c->emit_next);
      bool passed = c->highest_gulp >= c->emit_next + c->lead;
      if (s.gulp_id == c->emit_next && (s.ready || passed)) {
        if (!s.ready && c->expected_pkts_per_gulp > s.npkt)
          c->nmissing.fetch_add(c->expected_pkts_per_gulp - s.npkt,
                                std::memory_order_relaxed);
        int64_t seq0 = s.gulp_id * c->ntime_gulp;
        // swap the filled buffer out and recycle a zeroed one so the
        // 2x gulp-sized copy/zero happens OUTSIDE the lock — holding
        // `mu` here stalls the RX scatter long enough to overflow the
        // kernel socket buffer at high rate
        std::swap(s.data, c->scratch);
        std::swap(s.filled, c->scratch_filled);
        bool complete = s.ready, mixed = c->mixed_geometry;
        uint32_t expected = c->expected_pkts_per_gulp;
        s.gulp_id = -1;
        s.npkt = 0;
        s.ready = false;
        c->emit_next++;
        lk.unlock();
        memcpy(out, c->scratch.data(), c->gulp_nbyte);
        if (!complete && !mixed && expected)
          // zero only the holes, located via the landing bitmap
          cbd_capture_zero_holes(c, out, c->scratch_filled.data());
        return seq0;
      }
      // slot empty but stream has advanced: a fully-missing gulp
      if (s.gulp_id != c->emit_next && passed) {
        if (c->expected_pkts_per_gulp)
          c->nmissing.fetch_add(c->expected_pkts_per_gulp,
                                std::memory_order_relaxed);
        int64_t seq0 = c->emit_next * c->ntime_gulp;
        c->emit_next++;
        lk.unlock();
        memset(out, 0, c->gulp_nbyte);
        return seq0;
      }
    }
    if (!c->running.load()) return -1;
    if (c->cv.wait_until(lk, deadline) == std::cv_status::timeout)
      return -1;
  }
}

// 1 when the AF_XDP front end bound with multi-buffer (XDP_USE_SG):
// packets larger than one UMEM chunk — the production 6272 B snap2
// payloads — are reassembled from fragments.  0 for the recvmmsg
// front end or a single-buffer XDP bind.
int cbd_capture_xdp_sg(CbdCapture *c) {
  return c && c->xsk ? cbd_xsk_sg(c->xsk) : 0;
}

void cbd_capture_stats(CbdCapture *c, uint64_t *ngood_bytes,
                       uint64_t *npkt, uint64_t *nmissing,
                       uint64_t *nseq) {
  if (!c) return;
  if (ngood_bytes) *ngood_bytes = c->ngood_bytes.load();
  if (npkt) *npkt = c->npkt.load();
  if (nmissing) *nmissing = c->nmissing.load();
  if (nseq) *nseq = c->nseq.load();
}

void cbd_capture_stop(CbdCapture *c) {
  if (!c) return;
  c->running.store(false);
  c->cv.notify_all();
  if (c->rx.joinable()) c->rx.join();
}

void cbd_capture_destroy(CbdCapture *c) {
  if (!c) return;
  cbd_capture_stop(c);
  if (c->fd >= 0) close(c->fd);
  if (c->xsk) cbd_xsk_destroy(c->xsk);
  delete c;
}

}  // extern "C"

// Shared internals of the snap2 capture engine: the gulp-assembly core
// (slot ring, landing bitmaps, sequence-break bookkeeping) used by both
// RX front ends — the kernel-socket recvmmsg loop (capture.cpp) and the
// AF_XDP kernel-bypass loop (xdp_capture.cpp).  The reference offers the
// same pairing: UDPCapture (kernel sockets) vs UDPVerbsCapture (IB Verbs
// bypass), selected per deployment (reference:
// pipeline/lwa352_pipeline/blocks/capture_block.py:180-189).

#ifndef CBD_CAPTURE_IMPL_H_
#define CBD_CAPTURE_IMPL_H_

#include "cbd_native.h"

#include <atomic>
#include <condition_variable>
#include <mutex>
#include <thread>
#include <vector>

struct CbdSlot {
  std::vector<uint8_t> data;        // ntime_gulp * nchan * ninput
  std::vector<uint64_t> filled;     // per-packet landing bitmap: slots
                                    // are NOT pre-zeroed (a 65 MB memset
                                    // per gulp); holes are zeroed at
                                    // emit time from the bitmap instead
  int64_t gulp_id = -1;             // seq / ntime_gulp currently held
  uint32_t npkt = 0;                // packets landed in this slot
  bool ready = false;
};

struct CbdXsk;  // AF_XDP state (xdp_capture.cpp)

struct CbdCapture {
  int fd = -1;
  int nchan = 0, ninput = 0, ntime_gulp = 0, nbuf = 0;
  int lead = 2;  // emit a lossy gulp once the stream is this many ahead
  size_t gulp_nbyte = 0;
  uint32_t expected_pkts_per_gulp = 0;  // learned from first packet

  std::vector<CbdSlot> slots;
  std::mutex mu;
  std::condition_variable cv;
  int64_t emit_next = -1;           // next gulp_id to hand to the consumer
  int64_t highest_gulp = -1;

  std::atomic<uint64_t> ngood_bytes{0}, npkt{0}, nmissing{0}, nseq{0};
  int64_t last_seq = -1;
  int64_t skip_from = -1, skip_to = -1;  // gap to jump over on emission
  int backward_streak = 0;  // consecutive backward packets seen (resync
                            // hysteresis: one late straggler or spoofed
                            // datagram must not wipe the slot ring)

  std::thread rx;
  std::atomic<bool> running{false};
  std::vector<uint8_t> scratch;     // consumer-side swap buffer so the
                                    // gulp copy happens outside `mu`
  std::vector<uint64_t> scratch_filled;
  // learned packet geometry (first packet wins); if a later packet
  // disagrees, bitmap indexing is impossible and we fall back to
  // pre-zeroing slots on claim
  int pkt_nchan = 0, pkt_npol = 0;
  bool mixed_geometry = false;

  CbdXsk *xsk = nullptr;            // non-null => AF_XDP front end

  CbdSlot &slot_for(int64_t gulp_id) { return slots[gulp_id % nbuf]; }
};

// Validate one snap2 datagram and scatter its payload into the slot
// ring.  Caller holds c->mu.
void cbd_capture_process_locked(CbdCapture *c, const uint8_t *pkt,
                                size_t len);

// Zero every packet region whose landing bit is unset (bitmap-mode hole
// fill).
void cbd_capture_zero_holes(const CbdCapture *c, uint8_t *data,
                            const uint64_t *filled);

// AF_XDP front end hooks (xdp_capture.cpp).
CbdXsk *cbd_xsk_create(const char *ifname, int queue_id, int port);
void cbd_xsk_rx_loop(CbdCapture *c);
void cbd_xsk_destroy(CbdXsk *x);
int cbd_xsk_sg(const CbdXsk *x);  // 1 when multi-buffer (XDP_USE_SG)
                                  // bound: jumbo snap2 frames carried

#endif  // CBD_CAPTURE_IMPL_H_

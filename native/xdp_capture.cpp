// AF_XDP kernel-bypass RX front end for the snap2 capture engine.
//
// The reference offers IB Verbs kernel bypass as its high-rate capture
// option (UDPVerbsCapture, reference:
// pipeline/lwa352_pipeline/blocks/capture_block.py:180-189;
// docs/source/installation.rst "IB Verbs").  The portable Linux
// equivalent is AF_XDP: a BPF program on the NIC driver hook redirects
// matching UDP frames into a shared-memory UMEM ring, so packets skip
// the kernel network stack and socket-buffer copies entirely.
//
// Implemented against the raw kernel ABI (no libbpf dependency):
//   - UMEM + fill/completion/RX rings via setsockopt(SOL_XDP)/mmap
//   - a hand-assembled 19-instruction XDP program that parses
//     eth/IPv4/UDP, matches the destination port, and calls
//     bpf_redirect_map into an XSKMAP (non-matching traffic XDP_PASSes
//     to the normal stack, so other sockets on the interface keep
//     working)
//   - attachment through bpf_link (BPF_LINK_CREATE, generic/SKB mode —
//     works on loopback and veth; on a physical NIC the kernel picks
//     driver mode when available)
//
// UMEM chunks are capped at the page size (4096 B); packets larger
// than one chunk — the production snap2 wire is 6272 B of UDP payload
// (96 chans x 64 pols + 128 B header, reference:
// pipeline/scripts/lwa352-pipeline.py:177) — use the kernel's XDP
// multi-buffer mode: the socket binds with XDP_USE_SG, the filter
// program is loaded frags-aware (BPF_F_XDP_HAS_FRAGS), and RX
// descriptors carrying XDP_PKT_CONTD are reassembled here before
// snap2 processing.  On kernels without multi-buffer the bind falls
// back to single-buffer (sg=false, queryable via cbd_capture_xdp_sg)
// and the recvmmsg engine carries jumbo frames.

#include "capture_impl.h"

#include <arpa/inet.h>
#include <linux/bpf.h>
#include <linux/if_ether.h>
#include <linux/if_xdp.h>
#include <net/if.h>
#include <poll.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/socket.h>
#include <sys/syscall.h>
#include <unistd.h>

// multi-buffer ABI constants (kernel >= 6.6); the distro headers may
// predate them
#ifndef XDP_USE_SG
#define XDP_USE_SG (1 << 4)
#endif
#ifndef XDP_PKT_CONTD
#define XDP_PKT_CONTD (1 << 0)
#endif
#ifndef BPF_F_XDP_HAS_FRAGS
#define BPF_F_XDP_HAS_FRAGS (1U << 5)
#endif

namespace {

constexpr uint32_t kFrameSize = 4096;
constexpr uint32_t kNumFrames = 4096;          // = kRingSize: only ring
                                               // depth frames ever
                                               // circulate; a larger
                                               // UMEM is pinned dead
                                               // weight (16 MB total)
constexpr uint32_t kRingSize = 4096;

struct Ring {
  volatile uint32_t *producer = nullptr;
  volatile uint32_t *consumer = nullptr;
  void *desc = nullptr;
  void *map = nullptr;
  size_t map_len = 0;
};

long sys_bpf(int cmd, union bpf_attr *attr, unsigned int size) {
  return syscall(__NR_bpf, cmd, attr, size);
}

}  // namespace

struct CbdXsk {
  int fd = -1;                 // AF_XDP socket
  int map_fd = -1;             // XSKMAP
  int prog_fd = -1;            // XDP program
  int link_fd = -1;            // bpf_link pinning the attachment
  void *umem = nullptr;
  size_t umem_len = 0;
  Ring fill, rx;
  uint32_t fill_cached_prod = 0;
  uint32_t rx_cached_cons = 0;
  bool sg = false;             // multi-buffer (XDP_USE_SG) active
  // multi-frag packet reassembly (descriptors of one packet are
  // posted contiguously by the kernel)
  std::vector<uint8_t> frag_buf;
  bool assembling = false;
  bool frag_overflow = false;
};

int cbd_xsk_sg(const CbdXsk *x) { return x && x->sg ? 1 : 0; }

static int load_filter_prog(int map_fd, uint16_t port_be,
                            bool frags_aware) {
  // XDP program:
  //   if frame is IPv4/UDP to `port` -> bpf_redirect_map(xskmap,
  //   ctx->rx_queue_index, XDP_PASS)  else XDP_PASS
  struct bpf_insn insns[] = {
      // r6 = ctx
      {BPF_ALU64 | BPF_MOV | BPF_X, 6, 1, 0, 0},
      // r2 = ctx->data, r3 = ctx->data_end
      {BPF_LDX | BPF_MEM | BPF_W, 2, 6, offsetof(struct xdp_md, data), 0},
      {BPF_LDX | BPF_MEM | BPF_W, 3, 6,
       offsetof(struct xdp_md, data_end), 0},
      // bounds: need eth(14) + ip(20) + udp(8)
      {BPF_ALU64 | BPF_MOV | BPF_X, 4, 2, 0, 0},
      {BPF_ALU64 | BPF_ADD | BPF_K, 4, 0, 0, 42},
      {BPF_JMP | BPF_JGT | BPF_X, 4, 3, 14, 0},           // -> PASS
      // eth proto == IPv4 (bytes in network order)
      {BPF_LDX | BPF_MEM | BPF_H, 4, 2, 12, 0},
      {BPF_JMP | BPF_JNE | BPF_K, 4, 0, 12, (int32_t)htons(ETH_P_IP)},
      // ip header length must be 20 (ihl == 5, version 4)
      {BPF_LDX | BPF_MEM | BPF_B, 4, 2, 14, 0},
      {BPF_JMP | BPF_JNE | BPF_K, 4, 0, 10, 0x45},
      // ip proto == UDP
      {BPF_LDX | BPF_MEM | BPF_B, 4, 2, 23, 0},
      {BPF_JMP | BPF_JNE | BPF_K, 4, 0, 8, 17},
      // udp dest port
      {BPF_LDX | BPF_MEM | BPF_H, 4, 2, 36, 0},
      {BPF_JMP | BPF_JNE | BPF_K, 4, 0, 6, (int32_t)port_be},
      // r1 = map (ld_imm64), r2 = rx_queue_index, r3 = XDP_PASS
      {BPF_LD | BPF_IMM | BPF_DW, 1, BPF_PSEUDO_MAP_FD, 0, map_fd},
      {0, 0, 0, 0, 0},
      {BPF_LDX | BPF_MEM | BPF_W, 2, 6,
       offsetof(struct xdp_md, rx_queue_index), 0},
      {BPF_ALU64 | BPF_MOV | BPF_K, 3, 0, 0, XDP_PASS},
      {BPF_JMP | BPF_CALL, 0, 0, 0, BPF_FUNC_redirect_map},
      {BPF_JMP | BPF_EXIT, 0, 0, 0, 0},
      // PASS:
      {BPF_ALU64 | BPF_MOV | BPF_K, 0, 0, 0, XDP_PASS},
      {BPF_JMP | BPF_EXIT, 0, 0, 0, 0},
  };
  union bpf_attr attr{};
  attr.prog_type = BPF_PROG_TYPE_XDP;
  attr.insn_cnt = sizeof(insns) / sizeof(insns[0]);
  attr.insns = (uint64_t)insns;
  attr.license = (uint64_t) "GPL";
  // frags-aware: multi-buffer packets reach the program instead of
  // being dropped before it (the filter only reads the first 42 bytes
  // with an explicit bounds check, so fragmentation is safe)
  if (frags_aware) attr.prog_flags = BPF_F_XDP_HAS_FRAGS;
  return (int)sys_bpf(BPF_PROG_LOAD, &attr, sizeof(attr));
}

static bool map_ring(int fd, Ring *r, uint64_t pgoff, size_t desc_size,
                     uint32_t nentries, const xdp_ring_offset &off) {
  size_t len = off.desc + (size_t)nentries * desc_size;
  void *m = mmap(nullptr, len, PROT_READ | PROT_WRITE,
                 MAP_SHARED | MAP_POPULATE, fd, pgoff);
  if (m == MAP_FAILED) return false;
  r->map = m;
  r->map_len = len;
  r->producer = (volatile uint32_t *)((uint8_t *)m + off.producer);
  r->consumer = (volatile uint32_t *)((uint8_t *)m + off.consumer);
  r->desc = (uint8_t *)m + off.desc;
  return true;
}

CbdXsk *cbd_xsk_create(const char *ifname, int queue_id, int port) {
  int ifindex = if_nametoindex(ifname);
  if (!ifindex) return nullptr;
  auto *x = new CbdXsk();
  bool ok = false;
  do {
    x->fd = socket(AF_XDP, SOCK_RAW, 0);
    if (x->fd < 0) break;
    x->umem_len = (size_t)kFrameSize * kNumFrames;
    x->umem = mmap(nullptr, x->umem_len, PROT_READ | PROT_WRITE,
                   MAP_PRIVATE | MAP_ANONYMOUS | MAP_POPULATE, -1, 0);
    if (x->umem == MAP_FAILED) { x->umem = nullptr; break; }
    xdp_umem_reg reg{};
    reg.addr = (uint64_t)x->umem;
    reg.len = x->umem_len;
    reg.chunk_size = kFrameSize;
    reg.headroom = 0;
    if (setsockopt(x->fd, SOL_XDP, XDP_UMEM_REG, &reg, sizeof(reg)))
      break;
    uint32_t n = kRingSize;
    if (setsockopt(x->fd, SOL_XDP, XDP_UMEM_FILL_RING, &n, sizeof(n)) ||
        setsockopt(x->fd, SOL_XDP, XDP_UMEM_COMPLETION_RING, &n,
                   sizeof(n)) ||
        setsockopt(x->fd, SOL_XDP, XDP_RX_RING, &n, sizeof(n)))
      break;
    xdp_mmap_offsets off{};
    socklen_t optlen = sizeof(off);
    if (getsockopt(x->fd, SOL_XDP, XDP_MMAP_OFFSETS, &off, &optlen))
      break;
    if (!map_ring(x->fd, &x->fill, XDP_UMEM_PGOFF_FILL_RING,
                  sizeof(uint64_t), kRingSize, off.fr) ||
        !map_ring(x->fd, &x->rx, XDP_PGOFF_RX_RING, sizeof(xdp_desc),
                  kRingSize, off.rx))
      break;
    // give every frame to the kernel up front
    auto *fdesc = (uint64_t *)x->fill.desc;
    uint32_t prod = *x->fill.producer;
    for (uint32_t i = 0; i < kRingSize; i++)
      fdesc[(prod + i) & (kRingSize - 1)] = (uint64_t)(i)*kFrameSize;
    __sync_synchronize();
    *x->fill.producer = prod + kRingSize;
    x->fill_cached_prod = prod + kRingSize;

    sockaddr_xdp sxdp{};
    sxdp.sxdp_family = AF_XDP;
    sxdp.sxdp_ifindex = ifindex;
    sxdp.sxdp_queue_id = (uint32_t)queue_id;
    // generic/SKB copy path (works on lo/veth) + multi-buffer so the
    // production 6272 B snap2 payloads fit; kernels without XDP_USE_SG
    // reject the flag -> retry single-buffer (jumbo frames then need
    // the recvmmsg engine)
    sxdp.sxdp_flags = XDP_COPY | XDP_USE_SG;
    if (bind(x->fd, (sockaddr *)&sxdp, sizeof(sxdp)) == 0) {
      x->sg = true;
    } else {
      sxdp.sxdp_flags = XDP_COPY;
      if (bind(x->fd, (sockaddr *)&sxdp, sizeof(sxdp))) break;
    }

    union bpf_attr mattr{};
    mattr.map_type = BPF_MAP_TYPE_XSKMAP;
    mattr.key_size = 4;
    mattr.value_size = 4;
    mattr.max_entries = 64;
    x->map_fd = (int)sys_bpf(BPF_MAP_CREATE, &mattr, sizeof(mattr));
    if (x->map_fd < 0) break;
    union bpf_attr uattr{};
    uattr.map_fd = x->map_fd;
    uint32_t key = (uint32_t)queue_id;
    uint64_t val_fd = (uint32_t)x->fd;
    uint32_t val32 = (uint32_t)x->fd;
    (void)val_fd;
    uattr.key = (uint64_t)&key;
    uattr.value = (uint64_t)&val32;
    if (sys_bpf(BPF_MAP_UPDATE_ELEM, &uattr, sizeof(uattr))) break;

    x->prog_fd = load_filter_prog(x->map_fd, htons((uint16_t)port),
                                  x->sg);
    if (x->prog_fd < 0 && x->sg) {
      // kernel accepted the SG bind but rejects BPF_F_XDP_HAS_FRAGS:
      // a non-frags program never sees multi-frag packets, so the
      // capability must be reported as single-buffer or callers would
      // believe jumbo frames are carried while they silently vanish
      x->sg = false;
      x->prog_fd = load_filter_prog(x->map_fd, htons((uint16_t)port),
                                    false);
    }
    if (x->prog_fd < 0) break;
    union bpf_attr lattr{};
    lattr.link_create.prog_fd = x->prog_fd;
    lattr.link_create.target_ifindex = (uint32_t)ifindex;
    lattr.link_create.attach_type = BPF_XDP;
    lattr.link_create.flags = 2;  // XDP_FLAGS_SKB_MODE (generic)
    x->link_fd = (int)sys_bpf(BPF_LINK_CREATE, &lattr, sizeof(lattr));
    if (x->link_fd < 0) {
      lattr.link_create.flags = 0;  // let the kernel pick the mode
      x->link_fd = (int)sys_bpf(BPF_LINK_CREATE, &lattr, sizeof(lattr));
    }
    if (x->link_fd < 0) break;
    ok = true;
  } while (false);
  if (!ok) {
    cbd_xsk_destroy(x);
    return nullptr;
  }
  return x;
}

void cbd_xsk_destroy(CbdXsk *x) {
  if (!x) return;
  if (x->link_fd >= 0) close(x->link_fd);
  if (x->prog_fd >= 0) close(x->prog_fd);
  if (x->map_fd >= 0) close(x->map_fd);
  if (x->rx.map) munmap(x->rx.map, x->rx.map_len);
  if (x->fill.map) munmap(x->fill.map, x->fill.map_len);
  if (x->fd >= 0) close(x->fd);
  if (x->umem) munmap(x->umem, x->umem_len);
  delete x;
}

void cbd_xsk_rx_loop(CbdCapture *c) {
  CbdXsk *x = c->xsk;
  auto *rxd = (xdp_desc *)x->rx.desc;
  auto *fdesc = (uint64_t *)x->fill.desc;
  pollfd pfd{x->fd, POLLIN, 0};
  while (c->running.load(std::memory_order_relaxed)) {
    uint32_t prod = *x->rx.producer;
    __sync_synchronize();
    uint32_t cons = x->rx_cached_cons;
    if (prod == cons) {
      poll(&pfd, 1, 100);  // 100 ms: lets the loop observe stop
      continue;
    }
    uint32_t n = prod - cons;
    {
      std::lock_guard<std::mutex> lk(c->mu);
      for (uint32_t i = 0; i < n; i++) {
        const xdp_desc &d = rxd[(cons + i) & (kRingSize - 1)];
        const uint8_t *frame = (const uint8_t *)x->umem + d.addr;
        bool contd = (d.options & XDP_PKT_CONTD) != 0;
        if (x->assembling || contd) {
          // multi-buffer packet: the kernel posts its fragments as
          // consecutive descriptors, all but the last flagged CONTD.
          // Reassemble (bounded), then process the payload once.
          // cap = max UDP payload the recvmmsg engine carries (64 KiB)
          // PLUS the 42-byte eth/ip/udp headers that ride in frame 0 —
          // otherwise a maximum-size datagram is engine-dependently
          // dropped here while the socket engine processes it
          if (x->frag_buf.size() + d.len <= 65536 + 42)
            x->frag_buf.insert(x->frag_buf.end(), frame, frame + d.len);
          else
            x->frag_overflow = true;  // poison: drop at completion
          if (contd) {
            x->assembling = true;
            continue;
          }
          x->assembling = false;
          if (!x->frag_overflow && x->frag_buf.size() > 42)
            cbd_capture_process_locked(c, x->frag_buf.data() + 42,
                                       x->frag_buf.size() - 42);
          x->frag_buf.clear();
          x->frag_overflow = false;
          continue;
        }
        // eth(14) + ipv4(20) + udp(8): the BPF filter guaranteed the
        // layout; the UDP payload is the snap2 datagram
        if (d.len > 42)
          cbd_capture_process_locked(c, frame + 42, d.len - 42);
      }
      c->cv.notify_all();
    }
    // recycle the frames: consumer advance + fill-ring refill
    uint32_t fprod = x->fill_cached_prod;
    for (uint32_t i = 0; i < n; i++) {
      uint64_t addr = rxd[(cons + i) & (kRingSize - 1)].addr;
      fdesc[(fprod + i) & (kRingSize - 1)] = addr & ~((uint64_t)kFrameSize - 1);
    }
    __sync_synchronize();
    x->rx_cached_cons = cons + n;
    *x->rx.consumer = x->rx_cached_cons;
    *x->fill.producer = fprod + n;
    x->fill_cached_prod = fprod + n;
  }
  c->cv.notify_all();
}

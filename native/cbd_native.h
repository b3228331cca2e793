/* C ABI for the TPU X-engine's native host IO engine.
 *
 * TPU-native replacement for the reference's C++ packet engines (bifrost
 * UDPCapture/UDPVerbsCapture, reference: capture_block.py:180-189, and the
 * test_tx_mt.c load generator).  The hot RX loop runs in C++ with
 * recvmmsg batching and scatters packets straight into gulp-shaped
 * [time, chan, input] buffers that Python hands to the device feeder.
 */
#ifndef CBD_NATIVE_H
#define CBD_NATIVE_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct CbdCapture CbdCapture;

/* snap2 wire header (reference: test_tx_mt.c:38-49), little-endian. */
typedef struct __attribute__((packed)) {
    uint64_t seq;
    uint32_t magic;       /* 0xaabbccdd */
    uint16_t npol;
    uint16_t npol_tot;
    uint16_t nchan;
    uint16_t nchan_tot;
    uint32_t chan_block_id;
    uint32_t chan0;
    uint32_t pol0;
} cbd_snap2_hdr;

#define CBD_SNAP2_MAGIC 0xaabbccddu

/* Create a capture engine bound to ip:port assembling gulps of
 * ntime_gulp samples x nchan x ninput bytes into a ring of nbuf slots. */
CbdCapture *cbd_capture_create(const char *bind_ip, int port, int nchan,
                               int ninput, int ntime_gulp, int nbuf);

/* AF_XDP kernel-bypass variant (the reference's UDPVerbsCapture
 * analog): a BPF program on `ifname`/`queue_id` redirects UDP frames
 * for `port` straight into a shared-memory ring, skipping the kernel
 * network stack.  Same gulp/consumer API.  Returns NULL when AF_XDP
 * setup fails (old kernel, missing CAP_NET_ADMIN/CAP_BPF) — callers
 * fall back to the recvmmsg engine.  UMEM chunks cap packets at
 * ~4 KB (kernel page size) without XDP multi-buffer. */
CbdCapture *cbd_capture_create_xdp(const char *ifname, int queue_id,
                                   int port, int nchan, int ninput,
                                   int ntime_gulp, int nbuf);

/* Start the RX thread.  Returns 0 on success. */
int cbd_capture_start(CbdCapture *c);

/* Copy the next gulp (in arrival order) into out
 * (ntime_gulp*nchan*ninput bytes).  A gulp is released when it is
 * complete or when the writer has advanced past it.  Returns the gulp's
 * first seq number, or -1 on timeout/shutdown.
 *
 * SINGLE CONSUMER ONLY: the gulp copy and hole-zeroing happen in a
 * shared scratch buffer after the internal lock is dropped (so the RX
 * scatter is never stalled by the 10s-of-MB memcpy); two threads
 * calling get_gulp on the same engine concurrently race on that
 * scratch.  Use one consumer thread per engine. */
int64_t cbd_capture_get_gulp(CbdCapture *c, uint8_t *out,
                             double timeout_s);

/* 1 when the AF_XDP front end bound with multi-buffer (XDP_USE_SG):
 * packets larger than one UMEM chunk (the production 6272 B snap2
 * payloads) are reassembled from fragments.  0 for the recvmmsg front
 * end or a single-buffer XDP bind on an older kernel. */
int cbd_capture_xdp_sg(CbdCapture *c);

/* Counters: good payload bytes, packets received, packets missing in
 * emitted gulps, sequence-start count. */
void cbd_capture_stats(CbdCapture *c, uint64_t *ngood_bytes,
                       uint64_t *npkt, uint64_t *nmissing,
                       uint64_t *nseq);

void cbd_capture_stop(CbdCapture *c);
void cbd_capture_destroy(CbdCapture *c);

/* Blast a [ntime, nchan, ninput] gulp as snap2 packets to dest_ip:port.
 * nchan_per_pkt/npol_per_pkt set the packetization; delay_ns inserts a
 * nanosleep every 16*nchan_blocks packets (the reference blaster's
 * throttle, test_tx_mt.c:28-34); if miss_every > 0, every miss_every-th
 * packet is deliberately dropped (fault injection,
 * test_tx_mt.c:22,103-110).  Returns packets sent, or -1 on error. */
int64_t cbd_transmit_gulp(const char *dest_ip, int port,
                          const uint8_t *data, int64_t ntime, int nchan,
                          int ninput, int64_t seq0, int nchan_per_pkt,
                          int npol_per_pkt, long delay_ns,
                          int miss_every);

/* Loop the same gulp ngulp times with advancing sequence numbers,
 * entirely native: one socket, one absolute pacing deadline for the
 * whole stream (stable offered rate for the full-rate gates). */
int64_t cbd_transmit_stream(const char *dest_ip, int port,
                            const uint8_t *data, int64_t ntime,
                            int nchan, int ninput, int64_t seq0,
                            int64_t ngulp, int nchan_per_pkt,
                            int npol_per_pkt, long delay_ns,
                            int miss_every);

/* Packetize a dense int32 visibility cube as full-correlation packets
 * (custom 56-byte format) over UDP or to a file.  Returns packets
 * emitted, or -1 on error. */
int64_t cbd_cor_send_matrix(const char *dest_ip, int port,
                            const int32_t *vis_re, const int32_t *vis_im,
                            int nchan, int nstand, int npol,
                            uint64_t sync_time, uint64_t spectra_id,
                            double bw_hz, double sfreq_hz,
                            uint32_t acc_len, uint32_t chan0,
                            double max_mbps, const char *dump_path);

/* Same, in the production LWA-SV "COR" Mark5C format (32-byte header,
 * chan-major payload, 1-indexed stands; spec per the reference's
 * corr_output_full_block.py docstring and the decoder at
 * test_receivers/corr_full_rx_bifrost_packets.py:28-42).  time_tag and
 * navg are in ADC sample units; frame_number is the 24-bit subband
 * encoding (decimation<<16 | nsubband<<8 | subband). */
int64_t cbd_cor5c_send_matrix(const char *dest_ip, int port,
                              const int32_t *vis_re,
                              const int32_t *vis_im, int nchan,
                              int nstand, int npol, uint32_t frame_number,
                              uint32_t secs_count, uint16_t freq_count,
                              uint64_t time_tag, uint32_t navg,
                              double max_mbps, const char *dump_path);

#ifdef __cplusplus
}
#endif

#endif /* CBD_NATIVE_H */

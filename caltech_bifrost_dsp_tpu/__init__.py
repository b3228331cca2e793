"""TPU-native LWA-352 X-engine framework.

A brand-new JAX/XLA/Pallas re-design of the capabilities of
realtimeradio/caltech-bifrost-dsp (the LWA-352 streaming correlator +
multi-beam beamformer + transient voltage recorder): PFB channelization,
full-array cross-correlation with short/long integer accumulation, baseline
subselection, voltage/power beamforming, triggered voltage dumps, packetized
product outputs and an etcd-shaped control/monitoring plane.

Unlike the reference (13 pinned CPU threads joined by ring buffers, CUDA
kernels per stage), the compute for each time block here is a single fused,
jitted XLA program over a sharded TPU mesh; host-side rings survive only at
the system edges (ingest, egress, trigger history).

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from .config import XEngineConfig, LWA352

__all__ = ["XEngineConfig", "LWA352", "__version__"]

"""Wall-clock <-> spectra arithmetic (lwa352_utils parity)."""

from caltech_bifrost_dsp_tpu.utils import timeutils


def test_roundtrip():
    s = timeutils.time_to_spectra(1_700_000_000.0)
    t = timeutils.spectra_to_time(s)
    # one spectra quantum is 2*4096/196e6 ~ 41.8 us
    assert abs(t - 1_700_000_000.0) < 2 * 4096 / 196e6


def test_reference_formula_values():
    # transliteration check: sample = t*fs; spectra = sample // 8192
    t = 1234.5
    assert timeutils.time_to_spectra(t) == int(t * 196_000_000) // 8192


def test_next_allowed_start_rounds_to_granularity():
    start = timeutils.next_allowed_start(
        now=1000.0, delay_s=5.0, sync_time=0.0,
        spectra_rate_hz=23925.78125, granularity=2400)
    assert start % 2400 == 0
    spectra_at_deadline = (1005.0 - 0.0) * 23925.78125
    assert 0 <= spectra_at_deadline - start < 2400

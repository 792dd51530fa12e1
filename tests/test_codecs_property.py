"""Property tests for the real media codecs (pure Python — no Spark):
random rasters/sample payloads round-trip through the genuine
encoders and parsers, QuickCheck-style (FuzzyTests.hs is the
reference's model for this pillar)."""

import hashlib
import struct

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 10),
    channels=st.sampled_from([1, 3]),
    data=st.data(),
)
def test_png_roundtrip_random_rasters(w, h, channels, data):
    from rados_timestore_spark.queries_multimodal import (
        decode_png_real, encode_png)

    raster = bytes(
        data.draw(st.lists(st.integers(0, 255),
                           min_size=w * h * channels,
                           max_size=w * h * channels))
    )
    d = decode_png_real(encode_png(raster, w, h, channels))
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)
    assert d["feat_hash"] == hashlib.md5(raster).hexdigest()[:8]


@settings(max_examples=150, deadline=None)
@given(
    channels=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    frames=st.integers(1, 64),
    data=st.data(),
)
def test_wav_roundtrip_random_payloads(channels, rate, frames, data):
    from rados_timestore_spark.queries_multimodal import decode_wav_real

    block = channels * 2
    pcm = bytes(
        data.draw(st.lists(st.integers(0, 255),
                           min_size=frames * block,
                           max_size=frames * block))
    )
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block,
                      block, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    payload = (b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
               + chunks)
    d = decode_wav_real(payload)
    assert (d["sample_rate"], d["channels"], d["bits"]) == \
        (rate, channels, 16)
    assert d["n_frames"] == frames
    assert d["duration_us"] == frames * 1_000_000 // rate
    assert d["data_md5"] == hashlib.md5(pcm).hexdigest()[:8]


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(min_size=0, max_size=200))
def test_decoders_never_crash_ungracefully(payload):
    """Arbitrary bytes must produce a ValueError (or a valid decode),
    never struct.error / ZeroDivisionError / IndexError."""
    from rados_timestore_spark.queries_multimodal import (
        decode_image_real, decode_png_real, decode_wav_real)

    from rados_timestore_spark.queries_multimodal import decode_jpeg_header

    for dec in (decode_png_real, decode_wav_real, decode_image_real,
                decode_jpeg_header):
        try:
            dec(payload)
        except ValueError:
            pass

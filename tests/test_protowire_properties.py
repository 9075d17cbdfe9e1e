"""Property-based protowire + media-decoder robustness.

The codec properties pin round-trip fidelity under arbitrary inputs
(unicode, negative 64-bit ints, nested structs); the decoder
properties pin the never-raise contract on junk bytes — a malformed
payload in a 100 TB corpus must yield None/error-rows, not a failed
Spark stage.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from miniodb_spark import protowire as pw

# JSON-ish values a Struct can carry (protobuf numbers are doubles —
# generate floats that survive the double round trip exactly)
_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)
_json_value = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=10), inner, max_size=4),
    ),
    max_leaves=12,
)


@given(st.dictionaries(st.text(max_size=15), _json_value, max_size=6))
@settings(max_examples=150, deadline=None)
def test_struct_round_trip_property(d):
    assert pw.decode_struct(pw.encode_struct(d)) == d


@given(st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1))
@settings(max_examples=200, deadline=None)
def test_int64_round_trip_property(n):
    schema = {1: ("x", "int64")}
    assert pw.decode_message(schema, pw.encode_message(schema, {"x": n})) == {"x": n}


@given(st.integers(min_value=0, max_value=2 ** 64 - 1))
@settings(max_examples=200, deadline=None)
def test_uvarint_round_trip_property(n):
    assert pw.decode_uvarint(pw.encode_uvarint(n), 0)[0] == n


@given(st.text(max_size=60), st.integers(min_value=0, max_value=2 ** 31 - 1),
       st.dictionaries(st.text(max_size=8), _scalar, max_size=4))
@settings(max_examples=100, deadline=None)
def test_write_request_round_trip_property(table, ts_us, payload):
    obj = {"table": table,
           "data": {"id": "x", "timestamp": ts_us, "payload": payload}}
    out = pw.decode_message(pw.WRITE_DATA_REQUEST,
                            pw.encode_message(pw.WRITE_DATA_REQUEST, obj))
    assert out["table"] == table
    data = out["data"]
    assert data["payload"] == payload
    assert data["timestamp"] == (ts_us if ts_us else None) or ts_us == 0


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_decode_message_never_raises_uncontrolled(data):
    """Arbitrary bytes against every schema: decode either succeeds or
    raises ValueError (the controlled failure) — never IndexError/
    struct.error/KeyError."""
    for schema in (pw.WRITE_DATA_REQUEST, pw.QUERY_DATA_RESPONSE,
                   pw.TABLE_CONFIG, pw.GET_STATUS_RESPONSE):
        try:
            pw.decode_message(schema, data)
        except ValueError:
            pass


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_media_decoders_never_raise_on_junk(data):
    from miniodb_spark.operators.jpeg import decode_jpeg_pixels
    from miniodb_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_png_pixels,
        decode_wav_samples,
        parse_image_header,
        parse_wav_header,
    )

    for fn in (decode_png_pixels, decode_gif_pixels, decode_jpeg_pixels,
               decode_wav_samples, parse_image_header, parse_wav_header):
        out = fn(data)
        assert out is None or isinstance(out, dict)


@given(st.binary(max_size=200))
@settings(max_examples=150, deadline=None)
def test_media_decoders_never_raise_on_corrupted_real_files(data):
    """Splice junk into genuine PNG/GIF bytes — still no exceptions."""
    from miniodb_spark.operators.multimodal import (
        decode_gif_pixels,
        decode_png_pixels,
        gif_bytes,
        png_bytes,
    )

    png = png_bytes(6, 4, seed=3, channels=3, filter_type=2)
    gif = gif_bytes(6, 4, seed=3)
    for base, fn in ((png, decode_png_pixels), (gif, decode_gif_pixels)):
        cut = len(base) // 2
        out = fn(base[:cut] + data + base[cut:])
        assert out is None or isinstance(out, dict)

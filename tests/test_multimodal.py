"""Multimodal plumbing: Arrow-batched feature extraction over a binary
column — deterministic digests, unit-norm invariant, vector/summary
forms agree."""

import hashlib

from pyspark.sql import functions as F

from refimage_spark.operators.multimodal import (
    _fake_decode,
    extract_feature_vectors,
    extract_features,
    media_metadata,
)


def _media(documents):
    return documents.select(
        "doc_id", F.encode("text", "utf-8").alias("raw")
    ).limit(50)


def test_features_deterministic_and_hashable(spark, documents):
    rows = extract_features(_media(documents), "raw").collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.content_md5) == 32
        assert len(r.feature_digest) == 32
        assert r.feature_norm == 1.0  # encoder invariant, rounded to 4
    again = extract_features(_media(documents), "raw").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_vector_form_matches_summary_form(spark, documents):
    vecs = {r.doc_id: r for r in extract_feature_vectors(_media(documents), "raw").collect()}
    summ = {r.doc_id: r for r in extract_features(_media(documents), "raw").collect()}
    assert set(vecs) == set(summ)
    for did, v in vecs.items():
        assert v.content_md5 == summ[did].content_md5
        want = hashlib.md5(
            ",".join(f"{x:.6f}" for x in v.feature).encode()
        ).hexdigest()
        assert summ[did].feature_digest == want


def test_content_md5_matches_plain_md5(spark, documents):
    got = {r.doc_id: r.content_md5 for r in extract_features(_media(documents), "raw").collect()}
    want = {
        r.doc_id: hashlib.md5(r.text.encode()).hexdigest()
        for r in documents.limit(50).collect()
    }
    for did, dig in got.items():
        assert dig == want[did]


def test_fake_decode_unit_norm_and_seeded():
    import numpy as np

    a = _fake_decode(b"hello world")
    b = _fake_decode(b"hello world")
    c = _fake_decode(b"hello worle")
    np.testing.assert_array_equal(a, b)
    assert abs(float(np.linalg.norm(a.astype(np.float64))) - 1.0) < 1e-5
    assert not np.array_equal(a, c)


def test_media_metadata_detects_html(spark, documents):
    m = _media(documents)
    rows = media_metadata(m, "raw").collect()
    lens = {r.doc_id: r.meta.n_bytes for r in rows}
    want = {r.doc_id: len(r.raw) for r in m.collect()}
    assert lens == want


def _png(w, h):  # minimal header: signature + IHDR prefix
    return (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06\x00\x00\x00"
    )


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _jpeg(w, h):
    # SOI + APP0 stub + SOF0 with (h, w)
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0


def test_sniff_media_formats():
    from refimage_spark.operators.multimodal import sniff_media

    assert sniff_media(_png(640, 480)) == ("image/png", 640, 480)
    assert sniff_media(_gif(12, 34)) == ("image/gif", 12, 34)
    assert sniff_media(_jpeg(1920, 1080)) == ("image/jpeg", 1920, 1080)
    assert sniff_media(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == ("image/webp", None, None)
    assert sniff_media(b"%PDF-1.7 ...") == ("application/pdf", None, None)
    assert sniff_media(b"<!DOCTYPE html><html>...") == ("text/html", None, None)
    assert sniff_media(b"\x00\x01binary junk") == (
        "application/octet-stream", None, None,
    )


def test_media_metadata_mixed_binary_column(spark):
    rows = [
        (1, bytearray(_png(640, 480))),
        (2, bytearray(_gif(12, 34))),
        (3, bytearray(_jpeg(1920, 1080))),
        (4, bytearray(b"<html><body>hi</body></html>")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    got = {r.doc_id: r.meta for r in media_metadata(df, "raw").collect()}
    assert got[1].mime == "image/png" and (got[1].width, got[1].height) == (640, 480)
    assert got[2].mime == "image/gif" and (got[2].width, got[2].height) == (12, 34)
    assert got[3].mime == "image/jpeg" and (got[3].width, got[3].height) == (1920, 1080)
    assert got[4].mime == "text/html" and got[4].width is None
    assert all(got[i].n_bytes == len(bytes(rows[i - 1][1])) for i in got)


def test_sniff_jpeg_padding_and_standalone_markers():
    """0xFF fill bytes between segments and standalone TEM/RSTn markers
    are legal JPEG — the walk must step over them, not length-parse them."""
    from refimage_spark.operators.multimodal import sniff_media

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + (77).to_bytes(2, "big") + (99).to_bytes(2, "big") + b"\x03" + b"\x00" * 9
    )
    # fill bytes before a marker + a standalone TEM + RST1 in the stream
    padded = b"\xff\xd8" + b"\xff\xff\xff" + app0 + b"\xff\x01" + b"\xff\xd1" + sof0
    assert sniff_media(padded) == ("image/jpeg", 99, 77)
    # EOI before any SOF -> dims unknown, never a garbage parse
    assert sniff_media(b"\xff\xd8" + app0 + b"\xff\xd9" + sof0) == (
        "image/jpeg", None, None,
    )


def test_sniff_media_never_crashes_fuzz():
    """sniff_media must return a (mime, w, h) tuple for ARBITRARY bytes —
    including adversarial JPEG-prefixed streams that stress the segment
    walk's bounds handling."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from refimage_spark.operators.multimodal import sniff_media

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=64))
    def run(raw):
        for payload in (raw, b"\xff\xd8" + raw):
            mime, w, h = sniff_media(payload)
            assert isinstance(mime, str)
            assert w is None or (isinstance(w, int) and w >= 0)
            assert h is None or (isinstance(h, int) and h >= 0)

    run()

"""WARC/WET codec (datalib/warc.py): ISO 28500 record framing, the
CommonCrawl member-per-record gzip layout, HTTP envelope stripping, and
the Spark split/ingest seams."""

import gzip
import hashlib

import pytest

from nifi_spark.datalib.warc import (_synth_text, _synth_warc, build_warc,
                                     http_body, parse_warc, split_warc,
                                     synthesize_warc, wet_documents)


def _sample_records():
    body = b"<html><body>hello world</body></html>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode() + body)
    return [
        {"type": "warcinfo", "payload": b"software: test\r\n"},
        {"type": "response", "uri": "https://example.org/a", "payload": http},
        {"type": "conversion", "uri": "https://example.org/a",
         "content_type": "text/plain", "payload": b"hello world",
         "refers_to": "<urn:ref:1>"},
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    blob = build_warc(_sample_records(), gzip_per_record=gz)
    recs = parse_warc(blob)
    assert [r["type"] for r in recs] == ["warcinfo", "response", "conversion"]
    assert recs[1]["uri"] == "https://example.org/a"
    status, body = http_body(recs[1]["payload"])
    assert status == 200 and body == b"<html><body>hello world</body></html>"
    assert recs[2]["payload"] == b"hello world"
    assert recs[2]["headers"]["WARC-Refers-To"] == "<urn:ref:1>"
    # required headers present and well-formed
    for r in recs:
        assert r["record_id"].startswith("<urn:uuid:")
        assert r["date"].endswith("Z")


def test_warc_gzip_is_member_per_record():
    blob = build_warc(_sample_records(), gzip_per_record=True)
    # three independent gzip members -> three magic headers
    assert blob.count(b"\x1f\x8b\x08") == 3
    # and a seek to the second member parses standalone (the CommonCrawl
    # random-access property)
    second = blob.index(b"\x1f\x8b\x08", 1)
    third = blob.index(b"\x1f\x8b\x08", second + 1)
    one = parse_warc(blob[second:third])
    assert len(one) == 1 and one[0]["type"] == "response"


def test_warc_deterministic_bytes():
    assert build_warc(_sample_records()) == build_warc(_sample_records())
    assert (build_warc(_sample_records(), gzip_per_record=True)
            == build_warc(_sample_records(), gzip_per_record=True))


def test_warc_truncation_and_garbage():
    blob = build_warc(_sample_records())
    with pytest.raises(ValueError):
        parse_warc(blob[:len(blob) - 30])
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(gzip.compress(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nx")
                   [:10])


def test_http_body_rejects_non_http():
    with pytest.raises(ValueError):
        http_body(b"plain text, no envelope")


def test_synth_formula_contract():
    # the fixture's conversion text must match the closed-form twin the
    # DuckDB oracle uses
    recs = parse_warc(_synth_warc(5))
    k = 1 + 5 % 3
    conv = [r for r in recs if r["type"] == "conversion"]
    assert len(conv) == k
    for j, r in enumerate(conv):
        assert r["payload"].decode() == _synth_text(5, j)
        assert r["uri"] == f"https://site{(5 * 7 + j) % 50}/page{j}"


def test_split_warc_spark(spark):
    ids = spark.range(0, 12)
    out = split_warc(synthesize_warc(ids, "id")).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    assert set(by_id) == set(range(12))
    for i, rows in by_id.items():
        k = 1 + i % 3
        rows.sort(key=lambda r: r["rec_idx"])
        assert len(rows) == 1 + 2 * k
        assert rows[0]["rec_type"] == "warcinfo"
        resp = [r for r in rows if r["rec_type"] == "response"]
        conv = [r for r in rows if r["rec_type"] == "conversion"]
        assert len(resp) == len(conv) == k
        for j, r in enumerate(resp):
            assert r["http_status"] == 200
            text = _synth_text(i, j)
            assert r["text"] == f"<html><body>{text}</body></html>"
            assert r["payload_md5"] == hashlib.md5(
                r["text"].encode()).hexdigest()
        for j, r in enumerate(conv):
            assert r["text"] == _synth_text(i, j)


def test_wet_documents_composes_with_datalib(spark):
    from nifi_spark.datalib.text import token_stats
    docs = wet_documents(synthesize_warc(spark.range(0, 8), "id"))
    rows = docs.collect()
    assert all(r["doc_id"] == r["doc_id"] // 1000 * 1000 + r["doc_id"] % 1000
               for r in rows)
    stats = token_stats(docs, text_col="text").collect()
    by_doc = {r["doc_id"]: r for r in stats}
    # archive 0 has K=1 conversion record at rec_idx 2 (warcinfo, response,
    # conversion) -> doc_id 2; its text has 20 + (0+0) % 11 = 20 tokens
    assert by_doc[2]["n_tokens"] == 20


def test_split_warc_error_row(spark):
    import pandas as pd
    pdf = pd.DataFrame({"id": [1], "payload": [b"not a warc at all"]})
    out = split_warc(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1 and out[0]["rec_type"] == "error"

"""WARC codec edge semantics (r13 container-codec review pass)."""

from pandas_sigproc_spark.sources.warc import decode_warc, encode_warc



def test_header_injection_refused():
    # r13 review finding: a crafted href with CR/LF forged headers or
    # truncated the record silently.
    import pytest as _pytest

    for uri in ("http://a/\r\nContent-Length: 0", "http://a/\r\n\r\nX",
                "http://a/\x00b"):
        with _pytest.raises(ValueError, match="header injection"):
            encode_warc([{"uri": uri, "payload": b"x"}])


def test_content_length_must_be_ascii_digits():
    import pytest as _pytest

    blob = encode_warc([{"uri": "http://a/", "payload": b"0123456789"}])
    bad = blob.replace(b"Content-Length: 10", b"Content-Length: 1_0")
    with _pytest.raises(ValueError, match="ASCII digits"):
        decode_warc(bad)


def test_folded_header_lines_extend_previous_field():
    # ISO 28500 §4 continuation lines (leading SP/HTAB)
    blob = encode_warc([{"uri": "http://a/long", "payload": b"hi"}])
    folded = blob.replace(
        b"WARC-Target-URI: http://a/long",
        b"WARC-Target-URI: http://a/\r\n  long",
    )
    (rec,) = decode_warc(folded)
    assert rec["uri"] == "http://a/ long"
    assert rec["payload"] == b"hi"


def test_empty_input_refuses():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty input"):
        decode_warc(b"")


def test_missing_uri_refuses():
    # r14 advice: a record with no uri previously encoded silently with
    # an empty WARC-Target-URI and a record id hashed over '' — a
    # silent data-loss path for malformed upstream rows.
    import pytest as _pytest

    for rec in ({"payload": b"x"}, {"uri": None, "payload": b"x"}):
        with _pytest.raises(ValueError, match="missing its 'uri'"):
            encode_warc([rec])


def test_warcinfo_and_metadata_need_no_uri():
    # r14 review finding: warcinfo/metadata records carry no
    # WARC-Target-URI per WARC 1.1 §5.12 — the mandatory-uri guard must
    # key on the record type, not reject them outright.
    blob = encode_warc(
        [
            {"type": "warcinfo", "payload": b"software: engine"},
            {"uri": "http://a/", "payload": b"body"},
        ]
    )
    assert b"WARC-Type: warcinfo" in blob
    head = blob.split(b"body")[0]
    first = head.split(b"WARC/1.1")[1]
    assert b"WARC-Target-URI" not in first
    recs = decode_warc(blob)
    assert len(recs) == 2
    # response records still refuse a missing uri
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing its 'uri'"):
        encode_warc([{"type": "response", "payload": b"x"}])


def test_empty_string_uri_refused_for_response():
    # r14 high-effort review: '' passed the missing/None guard and
    # silently encoded an empty WARC-Target-URI.
    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        encode_warc([{"uri": "", "payload": b"x"}])

"""Gated SigV4 ES HTTP bulk sink (streaming/es_http.py): everything up
to the socket — signing, canonicalization, request shape, chunking,
the transport gate — tested without any network."""

from __future__ import annotations

import datetime
import hashlib
import json

import pytest

from flink_stream_processing_refarch_spark.streaming.es_http import (
    EsHttpBulkSink,
    canonical_request,
    foreach_partition_writer,
    signing_key,
    sigv4_headers,
)

NOW = datetime.datetime(2015, 8, 30, 12, 36, 0, tzinfo=datetime.timezone.utc)


def test_signing_key_matches_aws_published_example():
    """The exact key-derivation example from the AWS SigV4 spec
    ('Deriving the signing key', secret wJalr.../20150830/us-east-1/iam)."""
    k = signing_key(
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "20150830",
        "us-east-1",
        "iam",
    )
    assert k.hex() == (
        "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9"
    )


def _sign(canon: str, date_stamp: str, region: str, service: str,
          amz_date: str, secret: str) -> str:
    """Compose a full SigV4 signature from the module's building blocks
    exactly as ``sigv4_headers`` does, but over an arbitrary signed
    header set — the published AWS vectors sign only host/x-amz-date
    (plus content-type in the docs example), while ``sigv4_headers``
    always adds x-amz-content-sha256, so the end-to-end header helper
    cannot reproduce the suite vectors verbatim."""
    import hmac as _hmac

    string_to_sign = "\n".join((
        "AWS4-HMAC-SHA256",
        amz_date,
        f"{date_stamp}/{region}/{service}/aws4_request",
        hashlib.sha256(canon.encode("utf-8")).hexdigest(),
    ))
    return _hmac.new(
        signing_key(secret, date_stamp, region, service),
        string_to_sign.encode("utf-8"),
        hashlib.sha256,
    ).hexdigest()


#: the AWS SigV4 test-suite credentials (public:
#: docs.aws.amazon.com 'Signature Version 4 test suite')
_SUITE_SECRET = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"


def test_signature_matches_aws_test_suite_get_vanilla():
    """VERDICT r11 #8: pin the signer against the spec, not the mirror.
    'get-vanilla' from AWS's published SigV4 test suite: GET / against
    example.amazonaws.com at 20150830T123600Z, region us-east-1,
    service 'service', empty payload — published signature
    5fa00fa3...fbf31."""
    canon, signed = canonical_request(
        "GET",
        "https://example.amazonaws.com/",
        {"host": "example.amazonaws.com",
         "x-amz-date": "20150830T123600Z"},
        b"",
    )
    assert signed == "host;x-amz-date"
    assert _sign(
        canon, "20150830", "us-east-1", "service",
        "20150830T123600Z", _SUITE_SECRET,
    ) == (
        "5fa00fa31553b73ebf1942676e86291e8372ff2a2260956d9b8aae1d763fbf31"
    )


def test_signature_matches_aws_docs_complete_example():
    """The complete worked example from the AWS General Reference
    SigV4 signing-process docs: GET
    https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08 with
    content-type/host/x-amz-date signed, 20150830T123600Z, us-east-1,
    iam. Both published intermediates pin: the canonical-request hash
    f536975d...1a59 and the final signature 5d672d79...b5d7."""
    canon, signed = canonical_request(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        {
            "host": "iam.amazonaws.com",
            "content-type": (
                "application/x-www-form-urlencoded; charset=utf-8"
            ),
            "x-amz-date": "20150830T123600Z",
        },
        b"",
    )
    assert signed == "content-type;host;x-amz-date"
    assert hashlib.sha256(canon.encode("utf-8")).hexdigest() == (
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"
    )
    assert _sign(
        canon, "20150830", "us-east-1", "iam",
        "20150830T123600Z", _SUITE_SECRET,
    ) == (
        "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_canonical_request_matches_aws_s3_docs_example():
    """The S3 GET-object worked example from the AWS docs (GET
    /test.txt on examplebucket with a Range header, 20130524): the
    published canonical-request hash 7344ae5b...6972 pins the
    canonicalization of a path + Range + x-amz-content-sha256 header
    set — a different service and signed-header shape from the other
    two vectors."""
    empty = hashlib.sha256(b"").hexdigest()
    canon, signed = canonical_request(
        "GET",
        "https://examplebucket.s3.amazonaws.com/test.txt",
        {
            "host": "examplebucket.s3.amazonaws.com",
            "range": "bytes=0-9",
            "x-amz-content-sha256": empty,
            "x-amz-date": "20130524T000000Z",
        },
        b"",
    )
    assert signed == "host;range;x-amz-content-sha256;x-amz-date"
    assert hashlib.sha256(canon.encode("utf-8")).hexdigest() == (
        "7344ae5b7ee6c3e7e6b0fe0640412a37625d1fbfff95c48bbb2dc43964946972"
    )


def test_canonical_request_shape():
    canon, signed = canonical_request(
        "POST",
        "https://search-x.us-east-1.es.amazonaws.com/_bulk?pretty=true&a=1",
        {"Host": "search-x.us-east-1.es.amazonaws.com", "X-Amz-Date": "t"},
        b"{}",
    )
    lines = canon.split("\n")
    assert lines[0] == "POST"
    assert lines[1] == "/_bulk"
    assert lines[2] == "a=1&pretty=true"  # sorted query
    assert signed == "host;x-amz-date"  # lowercased, sorted
    assert lines[-1] == hashlib.sha256(b"{}").hexdigest()


def test_sigv4_headers_deterministic_and_complete():
    kw = dict(
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        now=NOW,
    )
    h1 = sigv4_headers("POST", "https://es.example.com/_bulk", b"x\n", **kw)
    h2 = sigv4_headers("POST", "https://es.example.com/_bulk", b"x\n", **kw)
    assert h1 == h2  # injectable clock -> reproducible signature
    assert h1["x-amz-date"] == "20150830T123600Z"
    assert h1["x-amz-content-sha256"] == hashlib.sha256(b"x\n").hexdigest()
    auth = h1["authorization"]
    assert auth.startswith(
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/es/"
        "aws4_request, SignedHeaders="
    )
    assert "content-type;host;x-amz-content-sha256;x-amz-date" in auth
    assert len(auth.rsplit("Signature=", 1)[1]) == 64
    # a different payload must re-sign
    h3 = sigv4_headers("POST", "https://es.example.com/_bulk", b"y\n", **kw)
    assert h3["authorization"] != h1["authorization"]
    # temporary credentials add the session token to the signed set
    h4 = sigv4_headers(
        "POST", "https://es.example.com/_bulk", b"x\n",
        session_token="TOK", **kw,
    )
    assert h4["x-amz-security-token"] == "TOK"
    assert "x-amz-security-token" in h4["authorization"]


def test_bulk_request_shape_and_gate():
    sink = EsHttpBulkSink(
        "https://search-taxi.us-east-1.es.amazonaws.com/",
        region="us-east-1",
        access_key="AKIDEXAMPLE",
        secret_key="wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
    )
    action = json.dumps(
        {"index": {"_index": "taxi-dashboard", "_type": "pickup_count"}}
    )
    url, headers, body = sink.request_for([action, '{"a":1}'], now=NOW)
    assert url == "https://search-taxi.us-east-1.es.amazonaws.com/_bulk"
    assert body.endswith(b"\n")  # /_bulk requires the trailing newline
    assert body.decode().splitlines() == [action, '{"a":1}']
    assert headers["content-type"] == "application/x-ndjson"
    assert headers["host"] == "search-taxi.us-east-1.es.amazonaws.com"
    # the gate: no transport injected -> no network attempt, clear error
    with pytest.raises(RuntimeError, match="gated"):
        sink.post([action, '{"a":1}'])


def test_foreach_partition_writer_chunks_at_max_docs():
    """The executor-side body splits a partition into <= max_docs bulk
    requests (the reference's 500-doc policy) and flushes the tail."""
    posts: list[list[str]] = []
    sink = EsHttpBulkSink(
        "https://es.example.com",
        region="us-east-1",
        access_key="k",
        secret_key="s",
        max_docs=2,
        transport=lambda url, headers, body: posts.append(
            body.decode().splitlines()
        ) or 200,
    )
    rows = [{"value": f'{{"index":{{}}}}\n{{"doc":{i}}}'} for i in range(5)]
    foreach_partition_writer(sink)(iter(rows))
    assert [len(p) // 2 for p in posts] == [2, 2, 1]
    assert sum(len(p) for p in posts) == 10  # every action/doc delivered

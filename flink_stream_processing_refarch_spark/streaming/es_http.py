"""Gated SigV4-signed Elasticsearch HTTP bulk sink (reference parity:
flink-taxi-stream-processor/.../utils/ElasticsearchJestSink.java:105-136,
which signs Jest bulk requests with AWS SigV4 via an interceptor and
POSTs them to the domain's ``/_bulk`` endpoint).

Everything up to the network call is real and unit-tested: AWS
Signature Version 4 is implemented from the public specification
(https://docs.aws.amazon.com/general/latest/gr/sigv4-create-signed-request.html)
with stdlib ``hashlib``/``hmac`` only, and ``bulk_request`` produces the
exact (url, headers, body) triple a live domain accepts. The transport
itself is GATED — no Elasticsearch endpoint or AWS credentials exist in
this environment (same build-contract gate as ``sources/kinesis.py``):
``EsHttpBulkSink.post`` raises unless a transport callable is injected,
and swapping in the real network is the documented one-liner

    sink = EsHttpBulkSink(..., transport=urllib_transport)

Executor-side delivery: ``foreach_partition_writer`` returns a function
for ``DataFrame.foreachPartition`` over ``bulk_payload`` rows (see
``sinks.bulk_payload``) — each task signs and posts its own bulk
requests in MAX_DOCS chunks, the same every-subtask parallelism as the
reference's sink (ElasticsearchJestSink.java:45-102). No driver funnel.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import json
import urllib.parse

DEFAULT_MAX_DOCS = 500  # ElasticsearchJestSink.java:61-63
SERVICE = "es"


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _sha256_hex(payload: bytes) -> str:
    return hashlib.sha256(payload).hexdigest()


def signing_key(
    secret_key: str, date_stamp: str, region: str, service: str = SERVICE
) -> bytes:
    """The SigV4 key-derivation chain (kDate -> kRegion -> kService ->
    kSigning), per the public spec; unit-tested against AWS's published
    example vector."""
    k_date = _hmac(("AWS4" + secret_key).encode("utf-8"), date_stamp)
    k_region = _hmac(k_date, region)
    k_service = _hmac(k_region, service)
    return _hmac(k_service, "aws4_request")


def canonical_request(
    method: str,
    url: str,
    headers: dict[str, str],
    payload: bytes,
) -> tuple[str, str]:
    """(canonical_request, signed_headers) for a request whose signed
    headers are exactly the ones passed in (lowercased, sorted)."""
    parsed = urllib.parse.urlsplit(url)
    canon_uri = urllib.parse.quote(parsed.path or "/", safe="/-_.~")
    # canonical query: sorted key=value pairs, each URI-encoded
    pairs = urllib.parse.parse_qsl(parsed.query, keep_blank_values=True)
    canon_query = "&".join(
        f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
        for k, v in sorted(pairs)
    )
    items = sorted((k.lower(), " ".join(v.split())) for k, v in headers.items())
    canon_headers = "".join(f"{k}:{v}\n" for k, v in items)
    signed = ";".join(k for k, _ in items)
    return (
        "\n".join(
            (
                method.upper(),
                canon_uri,
                canon_query,
                canon_headers,
                signed,
                _sha256_hex(payload),
            )
        ),
        signed,
    )


def sigv4_headers(
    method: str,
    url: str,
    payload: bytes,
    *,
    access_key: str,
    secret_key: str,
    region: str,
    service: str = SERVICE,
    now: datetime.datetime | None = None,
    session_token: str | None = None,
    content_type: str = "application/x-ndjson",
) -> dict[str, str]:
    """Complete signed header set for one request. ``now`` is injectable
    so signatures are deterministic under test; live callers omit it."""
    if now is None:  # pragma: no cover - live path
        now = datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    date_stamp = now.strftime("%Y%m%d")
    host = urllib.parse.urlsplit(url).netloc
    headers = {
        "host": host,
        "x-amz-date": amz_date,
        "x-amz-content-sha256": _sha256_hex(payload),
        "content-type": content_type,
    }
    if session_token:
        headers["x-amz-security-token"] = session_token
    canon, signed = canonical_request(method, url, headers, payload)
    scope = f"{date_stamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        (
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            _sha256_hex(canon.encode("utf-8")),
        )
    )
    sig = hmac.new(
        signing_key(secret_key, date_stamp, region, service),
        string_to_sign.encode("utf-8"),
        hashlib.sha256,
    ).hexdigest()
    headers["authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}"
    )
    return headers


def urllib_transport(url: str, headers: dict[str, str], body: bytes) -> int:
    """The real network call (live environments only)."""
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method="POST")
    with urllib.request.urlopen(req) as resp:  # pragma: no cover - gated
        return resp.status


class EsHttpBulkSink:
    """Signs and posts ND-JSON bulk payloads to ``{endpoint}/_bulk``.

    ``transport`` is the gate: None (default) raises on post with a
    clear message — this sandbox has no ES domain or credentials; pass
    ``urllib_transport`` (or any (url, headers, body) -> status
    callable) to go live. Construction, chunking, and signing are fully
    functional either way.
    """

    def __init__(
        self,
        endpoint: str,
        *,
        region: str,
        access_key: str,
        secret_key: str,
        session_token: str | None = None,
        max_docs: int = DEFAULT_MAX_DOCS,
        transport=None,
    ) -> None:
        self.url = endpoint.rstrip("/") + "/_bulk"
        self.region = region
        self.access_key = access_key
        self.secret_key = secret_key
        self.session_token = session_token
        self.max_docs = max_docs
        self.transport = transport

    def request_for(
        self, payload_lines: list[str], now: datetime.datetime | None = None
    ) -> tuple[str, dict[str, str], bytes]:
        """(url, signed headers, body) for one bulk request — the whole
        request minus the socket. The bulk body is newline-delimited
        action/source lines with the trailing newline /_bulk requires."""
        body = ("\n".join(payload_lines) + "\n").encode("utf-8")
        headers = sigv4_headers(
            "POST",
            self.url,
            body,
            access_key=self.access_key,
            secret_key=self.secret_key,
            region=self.region,
            session_token=self.session_token,
            now=now,
        )
        return self.url, headers, body

    def post(self, payload_lines: list[str]) -> int:
        if self.transport is None:
            raise RuntimeError(
                "EsHttpBulkSink transport is gated: no Elasticsearch "
                "endpoint/credentials in this environment. Pass "
                "transport=urllib_transport to go live."
            )
        url, headers, body = self.request_for(payload_lines)
        return self.transport(url, headers, body)


def foreach_partition_writer(sink: EsHttpBulkSink):
    """``df.foreachPartition`` body over ``sinks.bulk_payload`` rows:
    each task splits its partition into MAX_DOCS-doc bulk requests and
    posts them itself — the reference's per-subtask parallel delivery.
    Usage (live): ``bulk_payload(batch_df, doc_type, index)
    .foreachPartition(foreach_partition_writer(sink))`` inside
    ``foreachBatch``."""

    def body(rows) -> None:
        buf: list[str] = []
        n = 0
        for row in rows:
            buf.extend(row["value"].split("\n"))  # action line + doc line
            n += 1
            if n >= sink.max_docs:
                sink.post(buf)
                buf, n = [], 0
        if buf:
            sink.post(buf)

    return body

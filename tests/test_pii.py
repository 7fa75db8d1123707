"""PII scrubbing (operators/pii.py) — pattern portability is checked
by replaying the exact sequential redaction with Python ``re`` (the
third engine of the Java/RE2/Python portability contract)."""

import hashlib
import re

from tegola_spark.operators import pii


def _py_redact(s: str) -> str:
    s = re.sub(pii.EMAIL_RE, pii.EMAIL_TOKEN, s)
    s = re.sub(pii.IPV4_RE, pii.IP_TOKEN, s)
    return re.sub(pii.PHONE_RE, pii.PHONE_TOKEN, s)


SAMPLES = [
    "write to jane.doe+spam@mail.example.co.uk today",
    "server at 192.168.0.1 and 10.0.255.7, port 8080",
    "call +1 (555) 010-4242 or 555 010 9999 now",
    "mixed: a@b.io via 8.8.8.8 tel +44 20 7946 0958.",
    "no pii here at all",
    "edge.email@sub.domain.travel, ip 1.2.3.4.5 run-on",
]


def test_redaction_matches_python_re(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in pii.scrub_documents(df).collect()}
    for i, s in enumerate(SAMPLES):
        expect = _py_redact(s)
        assert rows[i]["text_redacted"] == expect, s
        assert rows[i]["redacted_md5"] == hashlib.md5(expect.encode()).hexdigest()
        assert rows[i]["n_emails"] == len(re.findall(pii.EMAIL_RE, s))
        assert rows[i]["n_ipv4"] == len(re.findall(pii.IPV4_RE, s))


def test_tokens_present_after_scrub(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io and 1.2.3.4 and +1 (555) 010-4242")],
        "doc_id long, text string")
    out = pii.scrub_documents(df).collect()[0]
    assert pii.EMAIL_TOKEN in out["text_redacted"]
    assert pii.IP_TOKEN in out["text_redacted"]
    assert pii.PHONE_TOKEN in out["text_redacted"]
    assert "@" not in out["text_redacted"].replace(pii.EMAIL_TOKEN, "")

"""X5 notification hooks + X1 CustomWebhookCheck via a fake transport."""

from __future__ import annotations

import pytest

from kafka_backup_spark.notification import (
    PagerDutyNotifier,
    SlackNotifier,
    custom_webhook_check,
    notify,
)

REPORT = {
    "report_id": "evidence-bk-9",
    "backup": {"backup_id": "bk-9"},
    "validation": {"overall": "passed", "passed": 3, "checks": 3},
}


class FakeTransport:
    def __init__(self, status=200, body="{}", raise_exc=None):
        self.calls = []
        self.status, self.body, self.raise_exc = status, body, raise_exc

    def __call__(self, url, payload, timeout_s):
        self.calls.append((url, payload, timeout_s))
        if self.raise_exc is not None:
            raise self.raise_exc
        return self.status, self.body


def test_slack_success_payload_shape():
    t = FakeTransport()
    SlackNotifier("https://hooks.example/slack", transport=t).send_success(
        REPORT, "https://evidence/report.json"
    )
    url, payload, _ = t.calls[0]
    assert url == "https://hooks.example/slack"
    header = payload["blocks"][0]["text"]["text"]
    assert "✅" in header and "passed" in header
    fields = payload["blocks"][1]["fields"]
    assert any("bk-9" in f["text"] for f in fields)
    assert any("3/3 checks" in f["text"] for f in fields)


def test_slack_failure_raises_on_http_error():
    t = FakeTransport(status=500, body="oops")
    with pytest.raises(RuntimeError, match="500"):
        SlackNotifier("https://hooks.example/slack", transport=t).send_failure(REPORT, "u")


def test_pagerduty_resolve_vs_trigger():
    t = FakeTransport(status=202)
    pd = PagerDutyNotifier("intkey", transport=t)
    pd.send_success(REPORT, "u")
    pd.send_failure(REPORT, "u")
    ok, bad = t.calls[0][1], t.calls[1][1]
    assert ok["event_action"] == "resolve" and ok["payload"]["severity"] == "info"
    assert bad["event_action"] == "trigger" and bad["payload"]["severity"] == "error"
    assert ok["dedup_key"] == "kafka-backup-validation-bk-9" == bad["dedup_key"]
    assert ok["routing_key"] == "intkey"


def test_notify_routes_by_overall_and_isolates_failures():
    good, boom = FakeTransport(), FakeTransport(raise_exc=RuntimeError("down"))
    results = notify(
        REPORT,
        "u",
        [SlackNotifier("https://a", transport=boom), SlackNotifier("https://b", transport=good)],
    )
    assert results[0].startswith("SlackNotifier: error")
    assert results[1] == "SlackNotifier: sent"
    assert len(good.calls) == 1  # sibling failure didn't block delivery

    failed = {**REPORT, "validation": {"overall": "failed", "passed": 1, "checks": 3}}
    t = FakeTransport()
    notify(failed, "u", [SlackNotifier("https://c", transport=t)])
    assert "❌" in t.calls[0][1]["blocks"][0]["text"]["text"]


def test_webhook_check_posts_context_and_passes():
    t = FakeTransport(body='{"result": "passed", "detail": "all good"}')
    res = custom_webhook_check(
        "custom-1", "https://hook", "bk-9",
        pitr_timestamp=123, bootstrap_servers=["b:9092"], transport=t,
    )
    assert res["outcome"] == "passed" and res["detail"] == "all good"
    _, payload, _ = t.calls[0]
    assert payload["event"] == "kafka_backup_validation"
    assert payload["backup_id"] == "bk-9"
    assert payload["restored_cluster"]["bootstrap_servers"] == ["b:9092"]


def test_webhook_check_unexpected_status_fails():
    res = custom_webhook_check(
        "c", "https://hook", "bk", transport=FakeTransport(status=503)
    )
    assert res["outcome"] == "failed" and "503" in res["detail"]


def test_webhook_check_interprets_body_outcomes():
    for result in ("failed", "warning", "skipped"):
        t = FakeTransport(body=f'{{"result": "{result}"}}')
        assert custom_webhook_check("c", "u", "b", transport=t)["outcome"] == result
    # unknown / absent result defaults to passed (webhook.rs:113-119)
    assert custom_webhook_check(
        "c", "u", "b", transport=FakeTransport(body='{"result": "banana"}')
    )["outcome"] == "passed"
    assert custom_webhook_check(
        "c", "u", "b", transport=FakeTransport(body="not-json")
    )["outcome"] == "passed"


def test_webhook_check_timeout_modes():
    t = FakeTransport(raise_exc=TimeoutError())
    assert custom_webhook_check("c", "u", "b", transport=t)["outcome"] == "failed"
    t2 = FakeTransport(raise_exc=TimeoutError())
    res = custom_webhook_check("c", "u", "b", fail_on_timeout=False, transport=t2)
    assert res["outcome"] == "skipped"


def test_webhook_check_network_error_fails():
    t = FakeTransport(raise_exc=ConnectionError("refused"))
    res = custom_webhook_check("c", "u", "b", transport=t)
    assert res["outcome"] == "failed" and "refused" in res["detail"]


def test_urllib_transport_unwraps_urlerror_timeout(monkeypatch):
    """urlopen wraps connect timeouts in URLError(reason=socket.timeout);
    the transport must surface TimeoutError so fail_on_timeout=False can
    return 'skipped' instead of 'failed' (ADVICE r2)."""
    import socket
    import urllib.error
    import urllib.request

    from kafka_backup_spark.notification import urllib_transport

    def fake_urlopen(req, timeout=None):
        raise urllib.error.URLError(socket.timeout("timed out"))

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    with pytest.raises(TimeoutError):
        urllib_transport("http://example.invalid/hook", {}, 0.01)
    res = custom_webhook_check(
        "c", "http://example.invalid/hook", "b",
        fail_on_timeout=False, transport=urllib_transport,
    )
    assert res["outcome"] == "skipped"

"""Notification hooks (X5) + CustomWebhookCheck (X1's webhook member).

Reference: notification/mod.rs (NotificationSender trait), notification/
slack.rs + pagerduty.rs (payload shapes), validation/webhook.rs
(CustomWebhookCheck semantics: POST context payload, expect a status code,
interpret {result, detail, data} from the body).

Driver-side glue by design — notifications fire once per validation run, not
per record, so there is nothing to distribute.  HTTP transport is injectable
(``transport(url, payload, timeout_s) -> (status_code, body_text)``) so every
payload and outcome path is testable offline; the default transport uses the
standard library, no extra dependency.
"""

from __future__ import annotations

import json
from typing import Any, Callable

Transport = Callable[[str, dict, float], tuple[int, str]]


def urllib_transport(url: str, payload: dict, timeout_s: float) -> tuple[int, str]:
    """Default POST-JSON transport (stdlib urllib; no network in tests)."""
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:  # pragma: no cover - needs a live socket
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.URLError as e:
        # urlopen wraps connect timeouts in URLError(reason=socket.timeout);
        # unwrap so custom_webhook_check's fail_on_timeout branch (which
        # catches TimeoutError) actually sees them (webhook.rs timeout
        # semantics).
        if isinstance(e.reason, TimeoutError):
            raise e.reason from e
        raise


class SlackNotifier:
    """Block-kit payload matching notification/slack.rs:44-74."""

    def __init__(self, webhook_url: str, transport: Transport = urllib_transport):
        self.webhook_url = webhook_url
        self.transport = transport

    def _payload(self, report: dict[str, Any], evidence_url: str, emoji: str) -> dict:
        v = report.get("validation", {})
        return {
            "blocks": [
                {
                    "type": "header",
                    "text": {
                        "type": "plain_text",
                        "text": f"{emoji} Kafka Backup Validation {v.get('overall', '')}",
                    },
                },
                {
                    "type": "section",
                    "fields": [
                        {"type": "mrkdwn", "text": f"*Backup ID:*\n{report['backup']['backup_id']}"},
                        {
                            "type": "mrkdwn",
                            "text": f"*Result:*\n{v.get('overall', '')} "
                            f"({v.get('passed', 0)}/{v.get('checks', 0)} checks)",
                        },
                        {"type": "mrkdwn", "text": f"*Evidence:*\n<{evidence_url}|Download Report>"},
                    ],
                },
            ]
        }

    def send_success(self, report: dict[str, Any], evidence_url: str) -> None:
        self._send(self._payload(report, evidence_url, "✅"))

    def send_failure(self, report: dict[str, Any], evidence_url: str) -> None:
        self._send(self._payload(report, evidence_url, "❌"))

    def _send(self, payload: dict) -> None:
        status, body = self.transport(self.webhook_url, payload, 10.0)
        if status >= 300:
            raise RuntimeError(f"Slack webhook returned {status}: {body}")


class PagerDutyNotifier:
    """Events-v2 payloads matching notification/pagerduty.rs:50-100:
    success resolves the dedup key, failure triggers it."""

    EVENTS_URL = "https://events.pagerduty.com/v2/enqueue"

    def __init__(self, integration_key: str, transport: Transport = urllib_transport):
        self.integration_key = integration_key
        self.transport = transport

    def _payload(self, report: dict[str, Any], evidence_url: str, action: str, severity: str, word: str) -> dict:
        v = report.get("validation", {})
        return {
            "routing_key": self.integration_key,
            "event_action": action,
            "dedup_key": f"kafka-backup-validation-{report['backup']['backup_id']}",
            "payload": {
                "summary": f"Kafka backup validation {word}: {report['report_id']}",
                "severity": severity,
                "source": "kafka-backup",
                "component": report["report_id"],
                "custom_details": {
                    "checks_passed": v.get("passed"),
                    "checks_total": v.get("checks"),
                    "evidence_url": evidence_url,
                },
            },
            "links": [{"href": evidence_url, "text": "Evidence Report"}],
        }

    def send_success(self, report: dict[str, Any], evidence_url: str) -> None:
        self._send(self._payload(report, evidence_url, "resolve", "info", "PASSED"))

    def send_failure(self, report: dict[str, Any], evidence_url: str) -> None:
        self._send(self._payload(report, evidence_url, "trigger", "error", "FAILED"))

    def _send(self, payload: dict) -> None:
        status, body = self.transport(self.EVENTS_URL, payload, 10.0)
        if status >= 300:
            raise RuntimeError(f"PagerDuty API returned {status}: {body}")


def notify(report: dict[str, Any], evidence_url: str, notifiers: list) -> list[str]:
    """Fan a validation result out to every configured hook; success/failure
    routing follows validation.overall.  Returns per-notifier status strings
    (a notifier failure must not mask the others — reference sends each
    independently)."""
    passed = str(report.get("validation", {}).get("overall", "")).lower() == "passed"
    results = []
    for n in notifiers:
        try:
            (n.send_success if passed else n.send_failure)(report, evidence_url)
            results.append(f"{type(n).__name__}: sent")
        except Exception as e:  # noqa: BLE001 - report, don't mask siblings
            results.append(f"{type(n).__name__}: error: {e}")
    return results


def custom_webhook_check(
    name: str,
    url: str,
    backup_id: str,
    pitr_timestamp: int | None = None,
    bootstrap_servers: list[str] | None = None,
    expected_status_code: int = 200,
    timeout_seconds: float = 30.0,
    fail_on_timeout: bool = True,
    transport: Transport = urllib_transport,
) -> dict[str, Any]:
    """X1 CustomWebhookCheck (validation/webhook.rs): POST the validation
    context, require the expected status, interpret {result, detail, data}
    from the body ('passed' when absent).  Returns a ValidationResult row:
    {check_name, outcome, detail, data}."""
    payload = {
        "event": "kafka_backup_validation",
        "backup_id": backup_id,
        "pitr_timestamp": pitr_timestamp,
        "restored_cluster": {"bootstrap_servers": bootstrap_servers or []},
    }
    try:
        status, body_text = transport(url, payload, timeout_seconds)
    except TimeoutError:
        if fail_on_timeout:
            return {
                "check_name": name,
                "outcome": "failed",
                "detail": f"Webhook timed out after {timeout_seconds}s",
                "data": {"error": "timeout"},
            }
        return {
            "check_name": name,
            "outcome": "skipped",
            "detail": "Webhook timed out (fail_on_timeout=false)",
            "data": {"error": "timeout"},
        }
    except Exception as e:  # noqa: BLE001 - network failure is a check failure
        return {
            "check_name": name,
            "outcome": "failed",
            "detail": f"Webhook request failed: {e}",
            "data": {"error": str(e)},
        }
    if status != expected_status_code:
        return {
            "check_name": name,
            "outcome": "failed",
            "detail": f"Expected status {expected_status_code}, got {status}",
            "data": {"status_code": status},
        }
    try:
        body = json.loads(body_text) if body_text else {}
    except ValueError:
        body = {}
    outcome = body.get("result", "passed")
    if outcome not in {"passed", "failed", "warning", "skipped"}:
        outcome = "passed"
    return {
        "check_name": name,
        "outcome": outcome,
        "detail": body.get("detail", "Webhook returned success"),
        "data": body.get("data", {}),
    }

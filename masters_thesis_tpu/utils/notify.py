"""Run-status notifications.

Reference: a Telegram bot pushes train/error updates (Tensorbot,
CNN_RNN/train.py:43-48; soloist). This image has zero egress, so the default
sink is a JSONL status file (tail it, or point a webhook at it from outside);
a webhook sink is provided behind an env var for deployments with egress.
"""

from __future__ import annotations

import json
import os
import time


class FileNotifier:
    def __init__(self, path: str):
        self.path = path

    def send(self, message: str, kind: str = "info") -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"ts": time.time(), "kind": kind,
                                "message": message}) + "\n")


class WebhookNotifier:  # pragma: no cover - needs egress
    def __init__(self, url: str | None = None):
        self.url = url or os.environ.get("MTT_WEBHOOK_URL", "")

    def send(self, message: str, kind: str = "info") -> None:
        if not self.url:
            return
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=json.dumps({"kind": kind, "message": message}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=5)
        except Exception:
            pass  # notifications must never take down training


def default_notifier(run_path: str):
    if os.environ.get("MTT_WEBHOOK_URL"):
        return WebhookNotifier()
    return FileNotifier(os.path.join(run_path, "notifications.jsonl"))

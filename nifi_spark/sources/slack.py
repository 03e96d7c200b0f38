"""PutSlack analog (nifi-slack-bundle).

NiFi ancestor: PutSlack.java — builds the incoming-webhook JSON
(text required, channel must start with ``#`` or ``@`` and be longer
than one char, optional username / icon_url / icon_emoji where the
emoji must be ``:wrapped:``), POSTs it FORM-ENCODED as
``payload=<urlencoded json>`` (:141-144 — not a JSON body!), and
routes 2xx → success, anything else / IO error → failure (penalized).

Transport = ``transport(url, body_bytes) -> (status, resp)``.
``put_slack`` processes a list of message dicts (one per FlowFile)
and returns (successes, failures) preserving input order within each.
"""

from __future__ import annotations

import json
import urllib.parse


def validate_channel(channel: str) -> str | None:
    """PutSlack.validateChannel — None means valid."""
    if (channel.startswith("#") or channel.startswith("@")) \
            and len(channel) > 1:
        return None
    return "Channel must begin with '#' or '@'"


def validate_emoji(emoji: str) -> bool:
    """The EmojiValidator: ':wrapped:' and longer than two chars."""
    return emoji.startswith(":") and emoji.endswith(":") \
        and len(emoji) > 2


def build_payload(msg: dict) -> dict | None:
    """The JSON object PutSlack builds, or None → failure (empty
    text / invalid channel)."""
    out: dict = {}
    text = msg.get("text")
    if not text:
        return None
    out["text"] = text
    channel = msg.get("channel")
    if channel:
        if validate_channel(channel) is not None:
            return None
        out["channel"] = channel
    for key in ("username", "icon_url", "icon_emoji"):
        if msg.get(key):
            out[key] = msg[key]
    return out


def put_slack(messages: "list[dict]", transport, *,
              webhook_url: str) -> tuple[list[dict], list[dict]]:
    """One POST per message; the body is the reference's exact
    ``payload=`` form encoding of the JSON."""
    ok: list[dict] = []
    failed: list[dict] = []
    for msg in messages:
        payload = build_payload(msg)
        if payload is None:
            failed.append(msg)
            continue
        body = ("payload=" + urllib.parse.quote_plus(
            json.dumps(payload, separators=(",", ":"),
                       sort_keys=True))).encode()
        try:
            status, _resp = transport(webhook_url, body)
        except IOError:
            failed.append(msg)
            continue
        (ok if 200 <= status < 300 else failed).append(msg)
    return ok, failed


class SlackWebhookServer:
    """In-process webhook endpoint: decodes the payload= form body
    back to the JSON object and records it; non-matching URL → 404."""

    def __init__(self, path: str = "/services/hook"):
        self.path = path
        self.posts: list[dict] = []

    def transport(self, url: str, body: bytes):
        if not url.endswith(self.path):
            return 404, b"no_service"
        form = urllib.parse.parse_qs(body.decode())
        if "payload" not in form:
            return 400, b"invalid_payload"
        self.posts.append(json.loads(form["payload"][0]))
        return 200, b"ok"

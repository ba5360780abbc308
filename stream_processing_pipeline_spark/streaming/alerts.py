"""Alert side-channel.

The reference emails from inside micro-batch processing when an anomaly
count exceeds zero (``/root/reference/src/spark_streaming.py:172-182``,
``/root/reference/src/utils.py:11-30`` — Gmail SMTP, STARTTLS, plain-text
MIME). Here alerting is an injectable interface so pipelines are testable
without SMTP, with an email implementation preserving the reference's
observable behavior (subject + body, counts interpolated).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)

__all__ = ["Alerter", "LogAlerter", "CallbackAlerter", "EmailAlerter"]


class Alerter:
    """Interface: called with (subject, body) when an alert predicate fires."""

    def send(self, subject: str, body: str) -> None:  # pragma: no cover
        raise NotImplementedError


class LogAlerter(Alerter):
    def __init__(self) -> None:
        self.sent: list[tuple[str, str]] = []

    def send(self, subject: str, body: str) -> None:
        self.sent.append((subject, body))
        logger.warning("ALERT %s: %s", subject, body)


@dataclass
class CallbackAlerter(Alerter):
    fn: Callable[[str, str], None]

    def send(self, subject: str, body: str) -> None:
        self.fn(subject, body)


@dataclass
class EmailAlerter(Alerter):
    """SMTP email parity (reference ``utils.py:11-30``): STARTTLS + login +
    plain-text MIME. Network I/O happens only on ``send``."""

    smtp_host: str
    smtp_port: int
    sender: str
    password: str
    recipients: list[str] = field(default_factory=list)

    def send(self, subject: str, body: str) -> None:  # pragma: no cover - needs SMTP
        import smtplib
        from email.mime.text import MIMEText

        msg = MIMEText(body, "plain")
        msg["Subject"] = subject
        msg["From"] = self.sender
        msg["To"] = ", ".join(self.recipients)
        with smtplib.SMTP(self.smtp_host, self.smtp_port) as server:
            server.starttls()
            server.login(self.sender, self.password)
            server.sendmail(self.sender, self.recipients, msg.as_string())

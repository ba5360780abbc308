"""LIVE SMTP alert test (K2 evidence): EmailAlerter against a real socket.

The reference emails anomaly alerts over SMTP with STARTTLS + LOGIN
(`/root/reference/src/utils.py:11-30`); `streaming/alerts.py:EmailAlerter`
preserves that wire behavior and was previously pinned only through the
injectable interface because the sandbox has no mail relay. This test IS
the relay: a minimal in-process SMTP server (socket thread) that speaks
the exact command sequence smtplib emits — EHLO, STARTTLS (real TLS
upgrade with a throwaway self-signed cert via the openssl CLI), EHLO
again, AUTH, MAIL FROM, RCPT TO, DATA — records everything, and lets the
test assert the alert arrived with the right envelope and MIME payload.

Skips cleanly when openssl is unavailable.
"""

from __future__ import annotations

import base64
import shutil
import socket
import ssl
import subprocess
import threading

import pytest

from stream_processing_pipeline_spark.streaming.alerts import EmailAlerter


class MiniSmtpServer(threading.Thread):
    """One-connection SMTP server with STARTTLS + AUTH PLAIN/LOGIN."""

    def __init__(self, certfile: str, keyfile: str) -> None:
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        self.ctx.load_cert_chain(certfile, keyfile)
        self.mail_from: str | None = None
        self.rcpt_to: list[str] = []
        self.data: str | None = None
        self.auth: str | None = None
        self.tls_upgraded = False
        self.error: str | None = None

    def run(self) -> None:  # noqa: C901 — linear protocol script
        try:
            conn, _ = self.sock.accept()
            f = conn.makefile("rb")

            def send(line: str) -> None:
                conn.sendall((line + "\r\n").encode())

            def recv() -> str:
                return f.readline().decode().rstrip("\r\n")

            send("220 mini ESMTP")
            while True:
                line = recv()
                cmd = line.split(" ", 1)[0].upper()
                if cmd == "EHLO":
                    if self.tls_upgraded:
                        send("250-mini")
                        send("250 AUTH PLAIN LOGIN")
                    else:
                        send("250-mini")
                        send("250 STARTTLS")
                elif cmd == "STARTTLS":
                    send("220 go ahead")
                    conn = self.ctx.wrap_socket(conn, server_side=True)
                    f = conn.makefile("rb")
                    self.tls_upgraded = True
                elif cmd == "AUTH":
                    # smtplib sends AUTH PLAIN <b64(\0user\0pass)> inline
                    self.auth = line.split(" ", 2)[2]
                    send("235 ok")
                elif cmd == "MAIL":
                    self.mail_from = line.split(":", 1)[1].strip()
                    send("250 ok")
                elif cmd == "RCPT":
                    self.rcpt_to.append(line.split(":", 1)[1].strip())
                    send("250 ok")
                elif cmd == "DATA":
                    send("354 end with .")
                    lines = []
                    while True:
                        dl = recv()
                        if dl == ".":
                            break
                        lines.append(dl)
                    self.data = "\n".join(lines)
                    send("250 accepted")
                elif cmd == "QUIT":
                    send("221 bye")
                    conn.close()
                    return
                else:
                    send("250 ok")
        except Exception as e:  # pragma: no cover — surfaced via self.error
            self.error = repr(e)


@pytest.fixture()
def smtp_server(tmp_path):
    if shutil.which("openssl") is None:
        pytest.skip("openssl CLI unavailable for throwaway cert")
    cert, key = str(tmp_path / "c.pem"), str(tmp_path / "k.pem")
    r = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", key, "-out", cert, "-days", "1", "-subj", "/CN=localhost"],
        capture_output=True, timeout=60,
    )
    if r.returncode != 0:
        pytest.skip(f"openssl cert generation failed: {r.stderr[-200:]}")
    srv = MiniSmtpServer(cert, key)
    srv.start()
    yield srv


def test_email_alerter_live_send(smtp_server):
    alerter = EmailAlerter(
        smtp_host="127.0.0.1",
        smtp_port=smtp_server.port,
        sender="pipeline@example.com",
        password="hunter2",
        recipients=["oncall@example.com", "dash@example.com"],
    )
    alerter.send("3 abnormal trips", "q2 flagged 3 rows in epoch 12")
    smtp_server.join(timeout=10)
    assert smtp_server.error is None, smtp_server.error
    assert smtp_server.tls_upgraded  # STARTTLS really negotiated
    # credentials crossed only after the TLS upgrade, as AUTH PLAIN
    assert smtp_server.auth is not None
    assert base64.b64decode(smtp_server.auth) == b"\x00pipeline@example.com\x00hunter2"
    assert smtp_server.mail_from == "<pipeline@example.com>"
    assert smtp_server.rcpt_to == ["<oncall@example.com>", "<dash@example.com>"]
    assert "Subject: 3 abnormal trips" in smtp_server.data
    assert "q2 flagged 3 rows in epoch 12" in smtp_server.data
    assert "To: oncall@example.com, dash@example.com" in smtp_server.data

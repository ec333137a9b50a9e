"""Native C++ supervisor (csrc/supervisor.cpp — the Tauri-shell
equivalent, SURVEY 2k.5): crash restart with backoff, preflight,
pidfile, signal-forwarded shutdown."""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from unsloth_tpu.studio.supervisor import supervisor_binary


@pytest.fixture(scope="module")
def binary():
    b = supervisor_binary()
    if b is None:
        pytest.skip("g++ unavailable")
    return b


def _wait(proc, timeout):
    try:
        return proc.wait(timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise


@pytest.mark.slow
def test_crash_restart_then_success(binary, tmp_path):
    """A child that crashes twice and then exits 0 is restarted twice;
    the supervisor then exits cleanly."""
    marker = tmp_path / "attempts"
    script = tmp_path / "flaky.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        p = {str(marker)!r}
        n = int(open(p).read()) if os.path.exists(p) else 0
        open(p, "w").write(str(n + 1))
        sys.exit(1 if n < 2 else 0)
    """))
    log = tmp_path / "sup.log"
    proc = subprocess.Popen(
        [binary, "--max-restarts", "5", "--log", str(log), "--",
         sys.executable, str(script)])
    assert _wait(proc, 60) == 0
    assert marker.read_text() == "3"  # two crashes + one clean run
    text = log.read_text()
    assert "restart 1/5" in text and "restart 2/5" in text
    assert "supervisor done" in text


@pytest.mark.slow
def test_restart_budget_exhausted(binary, tmp_path):
    proc = subprocess.Popen(
        [binary, "--max-restarts", "1", "--log",
         str(tmp_path / "sup.log"), "--",
         sys.executable, "-c", "import sys; sys.exit(7)"])
    assert _wait(proc, 60) == 1
    text = (tmp_path / "sup.log").read_text()
    assert "restart budget exhausted" in text
    assert "(code 7)" in text


def test_port_preflight_rejects_busy_port(binary, tmp_path):
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)
    port = s.getsockname()[1]
    try:
        proc = subprocess.Popen(
            [binary, "--port", str(port), "--log",
             str(tmp_path / "sup.log"), "--",
             sys.executable, "-c", "pass"])
        assert _wait(proc, 30) == 3
        assert "already in use" in (tmp_path / "sup.log").read_text()
    finally:
        s.close()


def test_sigterm_forwarded_and_pidfile(binary, tmp_path):
    """SIGTERM to the supervisor reaches the (long-running) child's
    process group; the pidfile is written while alive and removed."""
    pidfile = tmp_path / "studio.pid"
    script = tmp_path / "serve.py"
    script.write_text(textwrap.dedent("""
        import signal, sys, time
        signal.signal(signal.SIGTERM, lambda *a: sys.exit(0))
        while True:
            time.sleep(0.2)
    """))
    proc = subprocess.Popen(
        [binary, "--pidfile", str(pidfile), "--log",
         str(tmp_path / "sup.log"), "--", sys.executable, str(script)])
    for _ in range(100):
        if pidfile.exists():
            break
        time.sleep(0.1)
    child_pid = int(pidfile.read_text())
    assert child_pid > 0
    proc.send_signal(signal.SIGTERM)
    assert _wait(proc, 30) == 0
    assert not pidfile.exists()
    # the child is gone too (its pid no longer exists or is reaped)
    with pytest.raises(OSError):
        os.kill(child_pid, 0)


def test_health_wait_logs_port(binary, tmp_path):
    script = tmp_path / "serve.py"
    script.write_text(textwrap.dedent("""
        import http.server, socketserver, sys, threading, signal
        port = int(sys.argv[1])
        httpd = socketserver.TCPServer(("127.0.0.1", port),
                                       http.server.BaseHTTPRequestHandler)
        signal.signal(signal.SIGTERM,
                      lambda *a: threading.Thread(
                          target=httpd.shutdown).start())
        httpd.serve_forever()
        sys.exit(0)
    """))
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    log = tmp_path / "sup.log"
    proc = subprocess.Popen(
        [binary, "--port", str(port), "--log", str(log), "--",
         sys.executable, str(script), str(port)])
    healthy = False
    for _ in range(200):
        if log.exists() and "healthy" in log.read_text():
            healthy = True
            break
        time.sleep(0.1)
    proc.send_signal(signal.SIGTERM)
    _wait(proc, 30)
    assert healthy, log.read_text() if log.exists() else "no log"

"""Callback mail-server checker: protocol semantics pinned against
`email/checkerImpl/CallbackMailServerCheckerImpl.java` with fake
DNS/SMTP transports (the sandbox has no network; the reference's own
test is @Ignore'd for the same reason)."""

from __future__ import annotations

import pytest

from data_quality_spark.functions.mailserver import (
    REJECTED,
    VERIFIED,
    SMTPCheckError,
    Transport,
    check_email,
    check_email_result,
    get_response,
    parse_mx_records,
    verify_emails,
)


class FakeTransport(Transport):
    """Scripted SMTP conversation.  `script` maps the command PREFIX the
    client writes to the response line(s) the server buffers; `greeting`
    is buffered before any write.  Lines are handed out one readline()
    at a time; ready() is True while lines remain buffered."""

    def __init__(self, greeting, script):
        self._buf = list(greeting)
        self._script = script
        self.writes = []
        self.closed = False

    def readline(self):
        return self._buf.pop(0) if self._buf else None

    def ready(self):
        return bool(self._buf)

    def write(self, text):
        cmd = text.strip()
        self.writes.append(cmd)
        for prefix, lines in self._script.items():
            if cmd.startswith(prefix):
                self._buf.extend(lines)
                return

    def close(self):
        self.closed = True


ACCEPT_SCRIPT = {
    "EHLO": ["250-mx.example.com greets you", "250 SIZE 14680064"],
    "MAIL FROM": ["250 2.1.0 Ok"],
    "RCPT TO": ["250 2.1.5 Ok"],
    "RSET": ["250 2.0.0 Ok"],
    "QUIT": ["221 2.0.0 Bye"],
}


def accepting_connect(host, port):
    assert port == 25
    return FakeTransport(["220 mx.example.com ESMTP"], ACCEPT_SCRIPT)


def one_mx(domain):
    return ["10 mx.example.com."]


# --- MX parsing (TreeMap semantics, java lines 155-178) ---------------------


def test_mx_preference_order_and_trailing_dot():
    assert parse_mx_records(["20 b.example.com.", "10 a.example.com.", "30 c.example.com"]) == [
        "a.example.com",
        "b.example.com",
        "c.example.com",
    ]


def test_mx_bare_host_gets_preference_zero():
    assert parse_mx_records(["5 b.example.com.", "a.example.com"]) == [
        "a.example.com",
        "b.example.com",
    ]


def test_mx_duplicate_preference_overwrites():
    # Map<Integer,String> keyed by preference: the LAST record at a given
    # preference wins (java line 171) — a faithful quirk, pinned.
    assert parse_mx_records(["10 first.example.com.", "10 second.example.com."]) == [
        "second.example.com"
    ]


# --- response parsing (getResponse, java lines 93-126) ----------------------


def _resp(lines):
    return get_response(FakeTransport(lines, {}))


def test_response_single_line():
    assert _resp(["250 Ok"]) == 250


def test_response_multiline_continuation_updates_code():
    assert _resp(["250-first", "250 last"]) == 250


def test_response_skips_buffered_non_continuation_lines():
    # after the first code parses, a buffered NON-continuation line is
    # skipped (isSkipTheLine) — the 999 must not clobber the 250
    assert _resp(["250 Ok", "999 noise"]) == 250


def test_response_invalid_code_raises():
    with pytest.raises(SMTPCheckError):
        _resp(["554 rejected"])


def test_response_auth_required_raises():
    with pytest.raises(SMTPCheckError):
        _resp(["250 authentication is required"])


def test_response_empty_stream_raises():
    with pytest.raises(SMTPCheckError):
        _resp([])


# --- check() end-to-end (java lines 209-307) --------------------------------


def test_accept_path_and_dialogue_order():
    t = {}

    def connect(host, port):
        t["t"] = accepting_connect(host, port)
        return t["t"]

    assert check_email("user@example.com", one_mx, connect) is True
    assert [w.split(" ")[0].rstrip(":") for w in t["t"].writes] == [
        "EHLO",
        "MAIL",
        "RCPT",
        "RSET",
        "QUIT",
    ]
    assert t["t"].closed


def test_none_and_missing_at_rejected_without_io():
    def boom(*a):
        raise AssertionError("no I/O expected")

    assert check_email(None, boom, boom) is False
    assert check_email("not-an-email", boom, boom) is False


def test_loose_regex_caps_tld_at_4_chars():
    # the checker's OWN regex (java line 54) — 5-char TLD fails before I/O
    def boom(*a):
        raise AssertionError("no I/O expected")

    assert check_email("a@b.photos", boom, boom) is False
    assert check_email("a@b.info", one_mx, accepting_connect) is True


def test_empty_mx_list_rejected():
    assert check_email("user@example.com", lambda d: [], None) is False


def test_resolver_failure_raises():
    def resolver(domain):
        raise LookupError("DNS timeout")

    with pytest.raises(SMTPCheckError):
        check_email("user@example.com", resolver, accepting_connect)


def test_greeting_not_220_returns_false():
    def connect(host, port):
        return FakeTransport(["250 weird greeting"], ACCEPT_SCRIPT)

    assert check_email("user@example.com", one_mx, connect) is False


def test_rcpt_rejection_with_valid_code_raises():
    # a 550 RCPT response is an invalid code for getResponse → the
    # reference THROWS rather than returning false (java line 122)
    script = dict(ACCEPT_SCRIPT, **{"RCPT TO": ["550 5.1.1 no such user"]})

    def connect(host, port):
        return FakeTransport(["220 mx ESMTP"], script)

    with pytest.raises(SMTPCheckError):
        check_email("user@example.com", one_mx, connect)


def test_io_failure_tries_next_exchanger():
    tried = []

    def resolver(domain):
        return ["10 down.example.com.", "20 up.example.com."]

    def connect(host, port):
        tried.append(host)
        if host == "down.example.com":
            raise OSError("connection refused")
        return accepting_connect(host, port)

    assert check_email("user@example.com", resolver, connect) is True
    assert tried == ["down.example.com", "up.example.com"]


def test_all_exchangers_unreachable_raises():
    def connect(host, port):
        raise OSError("connection refused")

    with pytest.raises(SMTPCheckError):
        check_email("user@example.com", one_mx, connect)


def test_verdict_strings():
    assert check_email_result("user@example.com", one_mx, accepting_connect) == VERIFIED
    assert check_email_result("nope", one_mx, accepting_connect) == REJECTED


# --- distributed shape ------------------------------------------------------


def test_verify_emails_distinct_only(spark):
    """verify_emails probes each DISTINCT address once and yields a
    verdict column; injected fakes make it deterministic."""
    from data_quality_spark.functions.mailserver import fixture_connect, fixture_resolver

    rows = [
        ("a@ok2.com",),  # len(domain)=7 % 5 == 2 → greet-250 → REJECTED
        ("a@ok2.com",),  # duplicate: must not double-probe
        ("b@good.com",),  # len 8 % 5 == 3 → accept → VERIFIED
        ("bad",),  # syntax → REJECTED
    ]
    df = spark.createDataFrame(rows, ["email"])
    out = {
        r["email"]: r["mx_verdict"]
        for r in verify_emails(df, "email", fixture_resolver, fixture_connect).collect()
    }
    assert len(out) == 3
    assert out["b@good.com"] == VERIFIED
    assert out["bad"] == REJECTED

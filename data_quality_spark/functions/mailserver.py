"""Callback mail-server email verification (SMTP RCPT probing).

Re-expresses `email/checkerImpl/CallbackMailServerCheckerImpl.java:48-395`
(reference): syntax pre-check with the checker's own loose regex, an MX
lookup with A-record fallback, preference-ordered exchanger attempts, and
the SMTP dialogue 220 greeting → EHLO → MAIL FROM → RCPT TO (250 = the
address is accepted) with RSET/QUIT courtesy, trying the next exchanger on
connection errors.

The network side effect is fully injected: `check_email` takes a
``resolver`` (domain → raw MX attribute strings, the JNDI shape) and a
``connect`` callable (host, port → transport), so the protocol logic is
deterministic and unit-testable with fakes, and a cluster run can plug a
real DNS/SMTP transport (this sandbox has no network, so none ships
enabled — `live_unavailable` raises with instructions instead of probing).

Faithful behavioral details, each pinned by tests/test_mailserver.py:

- the loose syntax gate caps the TLD at 2-4 chars
  (`CallbackMailServerCheckerImpl.java:54`) — stricter than the chain's
  EmailValidator, so e.g. `a@b.photography` is rejected before any I/O;
- MX records parse as ``pref host`` with a trailing-dot strip; a
  bare-host record gets preference 0; DUPLICATE preferences overwrite
  (the reference collects into a TreeMap keyed by preference,
  `CallbackMailServerCheckerImpl.java:155-178`), and exchangers are tried
  in ascending-preference order;
- no MX records → the domain's A record stands in (machine itself);
  neither → REJECTED without any SMTP attempt;
- response parsing (`getResponse`, lines 93-126): the first buffered
  line sets the code; further buffered lines update it only when they are
  continuation lines (4th char ``-``); a final code outside
  {220, 221, 250} raises, as does a line containing
  "authentication is required";
- a connection/read failure moves on to the next exchanger; if every
  exchanger fails with I/O errors the checker RAISES (it cannot tell
  valid from invalid), it does not return False.

At cluster scale the checker must never run per row: `verify_emails`
verifies each DISTINCT address once via mapInPandas over the deduplicated
address set (10^12 rows is typically < 10^6 distinct domains), then the
caller joins verdicts back — same shape as the fuzzy-standardize
distinct-values device.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

VERIFIED = "VERIFIED"
REJECTED = "REJECTED"

# CallbackMailServerCheckerImpl.java:54 — the checker's OWN loose regex
# (2-4 char TLD), independent of the chain's EmailValidator.
LOOSE_EMAIL_RE = re.compile(r"^[a-zA-Z0-9._%-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,4}$")

SMTP_PORT = 25
_OK_CODES = frozenset({220, 221, 250})


class SMTPCheckError(RuntimeError):
    """TalendSMTPRuntimeException analog: the check could not decide."""


class Transport:
    """Duck-typed SMTP conversation: ``readline() -> str | None``,
    ``write(text)``, ``ready() -> bool``, ``close()``.  ``connect``
    callables raise OSError when the exchanger is unreachable."""

    def readline(self) -> str | None:  # pragma: no cover - protocol stub
        raise NotImplementedError

    def write(self, text: str) -> None:  # pragma: no cover - protocol stub
        raise NotImplementedError

    def ready(self) -> bool:  # pragma: no cover - protocol stub
        raise NotImplementedError

    def close(self) -> None:  # pragma: no cover - protocol stub
        pass


def parse_mx_records(attr_values: list[str]) -> list[str]:
    """JNDI MX attribute strings → exchanger hosts, ascending preference.

    ``"10 mx1.example.com."`` → pref 10, trailing dot stripped; a bare
    host gets pref 0; equal preferences OVERWRITE (TreeMap semantics,
    `CallbackMailServerCheckerImpl.java:155-171`)."""
    by_pref: dict[int, str] = {}
    for raw in attr_values:
        f = raw.split(" ")
        if len(f) == 1:
            pref, host = 0, f[0]
        elif f[1].endswith("."):
            pref, host = int(f[0]), f[1][:-1]
        else:
            pref, host = int(f[0]), f[1]
        by_pref[pref] = host
    return [by_pref[k] for k in sorted(by_pref)]


def get_response(transport: Transport) -> int:
    """`getResponse` semantics (lines 93-126): drain buffered lines; the
    first line sets the code, later lines update it only when they are
    continuation lines; invalid final codes and auth-required raise."""
    line: str | None = None
    res = 0
    while True:
        line = transport.readline()
        if line is not None and not (res != 0 and (len(line) < 4 or line[3] != "-")):
            try:
                res = int(line[:3])
            except ValueError:
                res = -1
        if not (transport.ready() and line is not None):
            break
    if res not in _OK_CODES or (line is not None and "authentication is required" in line):
        raise SMTPCheckError(line or f"SMTP code {res}")
    return res


def _write(transport: Transport, text: str) -> None:
    transport.write(text + "\r\n")


def check_email(
    email: str | None,
    resolver: Callable[[str], list[str]],
    connect: Callable[[str, int], Transport],
    port: int = SMTP_PORT,
) -> bool:
    """`check` (lines 209-307): True iff some exchanger accepts RCPT TO.

    ``resolver(domain)`` returns raw MX attribute strings (may consult the
    A record itself — the reference's fallback lives in its `getMX`); it
    raises to signal a lookup failure, which propagates as SMTPCheckError
    (the reference wraps NamingException the same way, line 340-346)."""
    if email is None or "@" not in email:
        return False
    if not LOOSE_EMAIL_RE.search(email):
        return False
    # the reference isolates the domain at the FIRST '@' (line 214)
    domain = email[email.index("@") + 1 :]
    try:
        mx_hosts = parse_mx_records(resolver(domain))
    except SMTPCheckError:
        raise
    except Exception as ex:  # NamingException analog
        raise SMTPCheckError(str(ex)) from ex
    if not mx_hosts:
        return False
    last_error = ""
    for host in mx_hosts:
        transport = None
        try:
            transport = connect(host, port)
            if get_response(transport) != 220:  # SMTP service ready
                return False
            _write(transport, f"EHLO {domain}")
            if get_response(transport) != 250:
                return False
            _write(transport, f"MAIL FROM: <{email}>")
            if get_response(transport) != 250:
                return False
            _write(transport, f"RCPT TO: <{email}>")
            res = get_response(transport)
            _write(transport, "RSET")
            get_response(transport)
            _write(transport, "QUIT")
            get_response(transport)
            return res == 250
        except OSError as ex:  # unreachable exchanger: try the next one
            last_error = str(ex)
            continue
        finally:
            if transport is not None:
                transport.close()
    raise SMTPCheckError(last_error)


def check_email_result(
    email: str | None,
    resolver: Callable[[str], list[str]],
    connect: Callable[[str, int], Transport],
    port: int = SMTP_PORT,
) -> str:
    """`checkEmail` (lines 375-377): VERIFIED / REJECTED verdict."""
    return VERIFIED if check_email(email, resolver, connect, port) else REJECTED


def live_unavailable(*_a, **_k):
    """Default resolver/connect: this sandbox has no network.  On a real
    cluster inject e.g. a dnspython resolver and a socket transport."""
    raise SMTPCheckError(
        "live DNS/SMTP verification needs network access: inject "
        "resolver/connect (see tests/test_mailserver.py for the protocol)"
    )


class ScriptedTransport(Transport):
    """In-memory SMTP conversation for the deterministic fixture world:
    `greeting` lines are buffered up front; each write whose command
    matches a script prefix buffers that response."""

    def __init__(self, greeting: list[str], script: dict[str, list[str]]):
        self._buf = list(greeting)
        self._script = script

    def readline(self) -> str | None:
        return self._buf.pop(0) if self._buf else None

    def ready(self) -> bool:
        return bool(self._buf)

    def write(self, text: str) -> None:
        cmd = text.strip()
        for prefix, lines in self._script.items():
            if cmd.startswith(prefix):
                self._buf.extend(lines)
                return


_ACCEPT = {
    "EHLO": ["250-mx greets you", "250 SIZE 14680064"],
    "MAIL FROM": ["250 2.1.0 Ok"],
    "RCPT TO": ["250 2.1.5 Ok"],
    "RSET": ["250 2.0.0 Ok"],
    "QUIT": ["221 2.0.0 Bye"],
}


def fixture_resolver(domain: str) -> list[str]:
    """Deterministic DNS world, a pure function of len(domain) % 5 —
    chosen so every protocol outcome is exercised AND a SQL oracle can
    replay the expected verdict independently (see `mx_verify_customer`):

    =====  =============================  ========
    class  behavior                       verdict
    =====  =============================  ========
    0      no MX records                  REJECTED
    1      first MX unreachable, second   VERIFIED
           accepts (failover path)
    2      greeting is 250 (valid code,   REJECTED
           not service-ready)
    3      exchanger accepts RCPT         VERIFIED
    4      EHLO answered 220 (valid       REJECTED
           code, not 250)
    =====  =============================  ========
    """
    cls = len(domain) % 5
    if cls == 0:
        return []
    if cls == 1:
        return [f"10 down.{domain}.", f"20 mx.{domain}."]
    return [f"10 mx.{domain}."]


def fixture_connect(host: str, port: int) -> Transport:
    """SMTP half of the fixture world (see `fixture_resolver`)."""
    if host.startswith("down."):
        raise OSError(f"connection refused: {host}:{port}")
    domain = host.split(".", 1)[1]
    cls = len(domain) % 5
    if cls == 2:
        return ScriptedTransport(["250 mx up but not service-ready"], _ACCEPT)
    if cls == 4:
        return ScriptedTransport(
            ["220 mx ESMTP"], dict(_ACCEPT, EHLO=["220 mx confused"])
        )
    return ScriptedTransport(["220 mx ESMTP"], _ACCEPT)


def verify_emails(
    df,
    col: str,
    resolver: Callable[[str], list[str]] = live_unavailable,
    connect: Callable[[str, int], Transport] = live_unavailable,
    port: int = SMTP_PORT,
):
    """DataFrame plan: verdict per DISTINCT address, never per row.

    The distinct set is what travels to Python workers (mapInPandas); at
    10^12 rows the address cardinality, not the row count, bounds the
    probe volume, and the caller broadcast-joins verdicts back.  An
    exchanger family that raises (all-I/O-failure, auth-required, DNS
    outage) yields the sentinel ``ERROR`` instead of poisoning the job.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("email", StringType()),
            StructField("mx_verdict", StringType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            verdicts = []
            for email in pdf["email"]:
                try:
                    verdicts.append(
                        check_email_result(email, resolver, connect, port)
                    )
                except SMTPCheckError:
                    verdicts.append("ERROR")
            yield pd.DataFrame({"email": pdf["email"], "mx_verdict": verdicts})

    distinct = df.select(F.col(col).alias("email")).distinct()
    return distinct.mapInPandas(run, schema)

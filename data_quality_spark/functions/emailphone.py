"""Email + phone validation (reference: dataquality-email, dataquality-phone).

Email — the reference runs a fluent chain of checkers, first-fail wins,
verdicts VALID/INVALID/CORRECTED/VERIFIED/REJECTED (`email/api/EmailVerify.
java:43-131`).  Ours is the same chain as a `when()` cascade: native, one
pass, short-circuit.  The SMTP/DNS callback checker
(`CallbackMailServerCheckerImpl.java`) lives in `mailserver.py` with the
network fully injected (resolver + transport): the protocol semantics are
deterministic and hash-verified over a fixture world; the LIVE probe path
ships disabled — a non-deterministic network side effect has no place in
a reproducible pipeline run.

Phone — the reference wraps libphonenumber (`phone/.../PhoneNumberHandlerBase.
java:54-423`).  We provide regex-based structural validation + E164/intl/
national formatting for NANP (+1) and generic international numbers as
native expressions; when the `phonenumbers` PyPI port (same Google metadata)
is installed, a pandas UDF upgrade path gives full parity — gated behind an
import-try.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# --- email -----------------------------------------------------------------

# RFC-ish split of user/domain (EmailValidator.USER_REGEX / IP_DOMAIN_REGEX
# semantics, `email/CommonCheck/EmailValidator.java:27-41`), RE2-safe.
EMAIL_USER_PATTERN = r"^[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]+$"
EMAIL_PATTERN = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"

VALID = "VALID"
INVALID = "INVALID"
CORRECTED = "CORRECTED"


def email_local_part(c: Column) -> Column:
    return F.substring_index(c, "@", 1)


def email_domain(c: Column) -> Column:
    return F.substring_index(c, "@", -1)


def email_tld(c: Column) -> Column:
    return F.substring_index(email_domain(c), ".", -1)


def is_valid_email(c: Column) -> Column:
    return c.rlike(EMAIL_PATTERN)


def email_verify(
    c: Column,
    domain_whitelist: tuple[str, ...] | None = None,
    domain_blacklist: tuple[str, ...] | None = None,
    tld_whitelist: tuple[str, ...] | None = None,
    local_part_regex: str | None = None,
    lowercase_correction: bool = False,
) -> Column:
    """The checker chain as a when() cascade — first failing checker wins,
    mirroring `EmailVerify.checkEmail` ordering (syntax → domains → TLD →
    local part), with the optional case-correction step returning CORRECTED
    (`email/checkerImpl/LocalPartRegexCheckerImpl.java`)."""
    verdict = F.when(~is_valid_email(c), F.lit(INVALID))
    if domain_blacklist:
        verdict = verdict.when(
            F.lower(email_domain(c)).isin(*[d.lower() for d in domain_blacklist]),
            F.lit(INVALID),
        )
    if domain_whitelist:
        verdict = verdict.when(
            ~F.lower(email_domain(c)).isin(*[d.lower() for d in domain_whitelist]),
            F.lit(INVALID),
        )
    if tld_whitelist:
        verdict = verdict.when(
            ~F.lower(email_tld(c)).isin(*[t.lower() for t in tld_whitelist]),
            F.lit(INVALID),
        )
    if local_part_regex:
        verdict = verdict.when(
            ~email_local_part(c).rlike(local_part_regex), F.lit(INVALID)
        )
    if lowercase_correction:
        verdict = verdict.when(c != F.lower(c), F.lit(CORRECTED))
    return verdict.otherwise(F.lit(VALID))


# --- phone -----------------------------------------------------------------

# Structural patterns (RE2-safe). NANP: +1 NXX NXX XXXX.
_NANP_PATTERN = r"^\+?1?[-. (]*([2-9][0-9]{2})[-. )]*([0-9]{3})[-. ]*([0-9]{4})$"
_INTL_PATTERN = r"^\+[1-9][0-9]{0,2}[-. ]*([0-9][-. ]*){6,14}$"


def phone_digits(c: Column) -> Column:
    return F.regexp_replace(c, r"[^0-9]", "")


def is_possible_phone(c: Column) -> Column:
    """isPossibleNumber analog: plausible digit count (7-15, ITU E.164)."""
    n = F.length(phone_digits(c))
    return (n >= 7) & (n <= 15)


def is_valid_phone(c: Column, region: str = "US") -> Column:
    """isValidNumber analog: structural validation per region."""
    if region == "US":
        return c.rlike(_NANP_PATTERN)
    return c.rlike(_INTL_PATTERN) | c.rlike(_NANP_PATTERN)


def format_e164(c: Column, region: str = "US") -> Column:
    """E164 formatting (`PhoneNumberHandlerBase.formatE164`): for NANP,
    +1 + 10 digits; null when invalid."""
    d = phone_digits(c)
    ten = F.when(
        (F.length(d) == 11) & d.startswith("1"), F.substring(d, 2, 10)
    ).otherwise(d)
    return F.when(is_valid_phone(c, region), F.concat(F.lit("+1"), ten))


def format_national(c: Column, region: str = "US") -> Column:
    """National format '(NXX) NXX-XXXX'."""
    d = phone_digits(c)
    ten = F.when(
        (F.length(d) == 11) & d.startswith("1"), F.substring(d, 2, 10)
    ).otherwise(d)
    return F.when(
        is_valid_phone(c, region),
        F.concat(
            F.lit("("), F.substring(ten, 1, 3), F.lit(") "),
            F.substring(ten, 4, 3), F.lit("-"), F.substring(ten, 7, 4),
        ),
    )


def phone_region(c: Column) -> Column:
    """Coarse region extraction from the country code (+1 → US/CA, etc.)."""
    d = phone_digits(c)
    return (
        F.when(c.startswith("+1") | ((F.length(d) == 11) & d.startswith("1")), "US")
        .when(c.startswith("+44"), "GB")
        .when(c.startswith("+49"), "DE")
        .when(c.startswith("+33"), "FR")
        .when(c.startswith("+34"), "ES")
        .when(c.startswith("+86"), "CN")
        .when(c.startswith("+81"), "JP")
        .when((F.length(d) == 10) & is_valid_phone(c, "US"), "US")
        .otherwise(F.lit(None).cast("string"))
    )


def libphonenumber_validate(c: Column, region: str = "US") -> Column:
    """Full-parity path via the `phonenumbers` PyPI port when available
    (same Google metadata as the reference's libphonenumber wrapper);
    falls back to the structural regex validator."""
    try:
        import phonenumbers  # noqa: F401

        @F.pandas_udf(StringType())
        def _validate(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            import phonenumbers as pn

            def one(v):
                if v is None:
                    return None
                try:
                    num = pn.parse(str(v), region)
                    return "VALID" if pn.is_valid_number(num) else "INVALID"
                except pn.NumberParseException:
                    return "INVALID"

            for s in batches:
                yield s.map(one)

        return _validate(c)
    except ImportError:
        return F.when(is_valid_phone(c, region), "VALID").otherwise("INVALID")

"""Phone metadata: number type / geocoder / timezone / country code.

Reference: `PhoneNumberHandlerBase` wraps libphonenumber's offline metadata
(`dataquality-phone/.../PhoneNumberHandlerBase.java:193-380` —
getCountryCodeForRegion, getPhoneNumberType, getGeocoderDescriptionForNumber,
getCarrierNameForNumber, plus the timezone mapper).  The full Google
metadata is tens of MB of compiled tables; this module re-expresses the
functions over PUBLIC data subsets as broadcast literal maps (pure Spark
expressions — no UDF, no join, no shuffle):

- NANP area-code → place / IANA timezone (curated NANPA subset; unknown
  valid codes fall back to "United States/Canada");
- ITU country calling codes → region / name / representative timezone;
- NANP number-type classes derivable from the numbering plan itself
  (toll-free 8xx set, premium 900, else FIXED_LINE_OR_MOBILE — NANP
  genuinely cannot distinguish fixed from mobile, which is exactly what
  libphonenumber returns for +1).

Carrier lookup (`getCarrierNameForNumber`) is NOT derivable from NANP
numbers at all (number portability); the full-parity path goes through the
`phonenumbers` PyPI port when installed (`emailphone.libphonenumber_validate`
pattern) and otherwise returns null — documented, not faked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .emailphone import is_valid_phone, phone_digits

# Public NANPA assignments (place, IANA tz) — representative subset; the
# full table is a drop-in data extension.
NANP_AREA_CODES: dict[int, tuple[str, str]] = {
    202: ("Washington, DC", "America/New_York"),
    212: ("New York, NY", "America/New_York"),
    213: ("Los Angeles, CA", "America/Los_Angeles"),
    215: ("Philadelphia, PA", "America/New_York"),
    216: ("Cleveland, OH", "America/New_York"),
    303: ("Denver, CO", "America/Denver"),
    305: ("Miami, FL", "America/New_York"),
    206: ("Seattle, WA", "America/Los_Angeles"),
    210: ("San Antonio, TX", "America/Chicago"),
    312: ("Chicago, IL", "America/Chicago"),
    313: ("Detroit, MI", "America/Detroit"),
    314: ("St. Louis, MO", "America/Chicago"),
    315: ("Syracuse, NY", "America/New_York"),
    310: ("Los Angeles, CA", "America/Los_Angeles"),
    404: ("Atlanta, GA", "America/New_York"),
    408: ("San Jose, CA", "America/Los_Angeles"),
    412: ("Pittsburgh, PA", "America/New_York"),
    415: ("San Francisco, CA", "America/Los_Angeles"),
    416: ("Toronto, ON", "America/Toronto"),
    503: ("Portland, OR", "America/Los_Angeles"),
    504: ("New Orleans, LA", "America/Chicago"),
    505: ("Albuquerque, NM", "America/Denver"),
    512: ("Austin, TX", "America/Chicago"),
    514: ("Montreal, QC", "America/Toronto"),
    602: ("Phoenix, AZ", "America/Phoenix"),
    604: ("Vancouver, BC", "America/Vancouver"),
    617: ("Boston, MA", "America/New_York"),
    702: ("Las Vegas, NV", "America/Los_Angeles"),
    713: ("Houston, TX", "America/Chicago"),
    808: ("Hawaii", "Pacific/Honolulu"),
    902: ("Nova Scotia", "America/Halifax"),
    907: ("Alaska", "America/Anchorage"),
}

# NANP service classes (the numbering plan itself defines these)
NANP_TOLL_FREE = (800, 888, 877, 866, 855, 844, 833)
NANP_PREMIUM = (900,)

# ITU country calling codes (public): code → (region, name, representative tz)
COUNTRY_CODES: dict[int, tuple[str, str, str]] = {
    1: ("US", "United States/Canada", "America/New_York"),
    7: ("RU", "Russia/Kazakhstan", "Europe/Moscow"),
    20: ("EG", "Egypt", "Africa/Cairo"),
    27: ("ZA", "South Africa", "Africa/Johannesburg"),
    30: ("GR", "Greece", "Europe/Athens"),
    31: ("NL", "Netherlands", "Europe/Amsterdam"),
    32: ("BE", "Belgium", "Europe/Brussels"),
    33: ("FR", "France", "Europe/Paris"),
    34: ("ES", "Spain", "Europe/Madrid"),
    39: ("IT", "Italy", "Europe/Rome"),
    40: ("RO", "Romania", "Europe/Bucharest"),
    41: ("CH", "Switzerland", "Europe/Zurich"),
    43: ("AT", "Austria", "Europe/Vienna"),
    44: ("GB", "United Kingdom", "Europe/London"),
    45: ("DK", "Denmark", "Europe/Copenhagen"),
    46: ("SE", "Sweden", "Europe/Stockholm"),
    47: ("NO", "Norway", "Europe/Oslo"),
    48: ("PL", "Poland", "Europe/Warsaw"),
    49: ("DE", "Germany", "Europe/Berlin"),
    52: ("MX", "Mexico", "America/Mexico_City"),
    55: ("BR", "Brazil", "America/Sao_Paulo"),
    61: ("AU", "Australia", "Australia/Sydney"),
    62: ("ID", "Indonesia", "Asia/Jakarta"),
    63: ("PH", "Philippines", "Asia/Manila"),
    64: ("NZ", "New Zealand", "Pacific/Auckland"),
    65: ("SG", "Singapore", "Asia/Singapore"),
    66: ("TH", "Thailand", "Asia/Bangkok"),
    81: ("JP", "Japan", "Asia/Tokyo"),
    82: ("KR", "South Korea", "Asia/Seoul"),
    84: ("VN", "Vietnam", "Asia/Ho_Chi_Minh"),
    86: ("CN", "China", "Asia/Shanghai"),
    90: ("TR", "Turkey", "Europe/Istanbul"),
    91: ("IN", "India", "Asia/Kolkata"),
    92: ("PK", "Pakistan", "Asia/Karachi"),
    234: ("NG", "Nigeria", "Africa/Lagos"),
    254: ("KE", "Kenya", "Africa/Nairobi"),
    351: ("PT", "Portugal", "Europe/Lisbon"),
    353: ("IE", "Ireland", "Europe/Dublin"),
    358: ("FI", "Finland", "Europe/Helsinki"),
    420: ("CZ", "Czechia", "Europe/Prague"),
    972: ("IL", "Israel", "Asia/Jerusalem"),
}

_REGION_TO_CODE = {region: code for code, (region, _n, _t) in COUNTRY_CODES.items()}
_REGION_TO_CODE["CA"] = 1  # NANP shares +1


def get_country_code_for_region(region: str) -> int | None:
    """`getCountryCodeForRegion` analog (driver-side scalar)."""
    return _REGION_TO_CODE.get(region.upper())


def _lit_map(d: dict) -> Column:
    pairs = []
    for k, v in sorted(d.items()):
        pairs.extend([F.lit(k), F.lit(v)])
    return F.create_map(*pairs)


def _nanp_area_code(c: Column) -> Column:
    """Area code of a valid NANP number, else null."""
    d = phone_digits(c)
    ten = F.when((F.length(d) == 11) & d.startswith("1"), F.substring(d, 2, 10)).otherwise(d)
    return F.when(is_valid_phone(c, "US"), F.substring(ten, 1, 3).cast("int"))


def phone_country_code(c: Column) -> Column:
    """`getCountryCodeForPhoneNumber` analog: +CC longest-prefix over the
    known table; bare 10/11-digit NANP numbers → 1.  Null when unknown."""
    d = phone_digits(c)
    has_plus = F.trim(c).startswith("+")
    c1 = F.substring(d, 1, 1).cast("int")
    c2 = F.substring(d, 1, 2).cast("int")
    c3 = F.substring(d, 1, 3).cast("int")
    one_digit = [code for code in COUNTRY_CODES if code < 10]
    two_digit = [code for code in COUNTRY_CODES if 10 <= code < 100]
    three_digit = [code for code in COUNTRY_CODES if code >= 100]
    return (
        F.when(has_plus & c1.isin(one_digit), c1)
        .when(has_plus & c2.isin(two_digit), c2)
        .when(has_plus & c3.isin(three_digit), c3)
        .when(is_valid_phone(c, "US"), F.lit(1))
        .otherwise(F.lit(None).cast("int"))
    )


def phone_number_type(c: Column) -> Column:
    """`getPhoneNumberType` analog for NANP: TOLL_FREE / PREMIUM_RATE /
    FIXED_LINE_OR_MOBILE (the plan cannot split fixed vs mobile — the same
    verdict libphonenumber gives for +1); non-NANP valid internationals →
    UNKNOWN (type tables not embedded); invalid → null."""
    area = _nanp_area_code(c)
    return (
        F.when(area.isin(list(NANP_TOLL_FREE)), "TOLL_FREE")
        .when(area.isin(list(NANP_PREMIUM)), "PREMIUM_RATE")
        .when(area.isNotNull(), "FIXED_LINE_OR_MOBILE")
        .when(phone_country_code(c).isNotNull(), "UNKNOWN")
        .otherwise(F.lit(None).cast("string"))
    )


def phone_geocoder_description(c: Column) -> Column:
    """`getGeocoderDescriptionForNumber` analog: NANP area-code place, or
    the country name for international numbers; valid-but-unmapped NANP
    codes → 'United States/Canada' (libphonenumber's own coarse
    fallback behavior)."""
    area = _nanp_area_code(c)
    cc = phone_country_code(c)
    places = _lit_map({k: v[0] for k, v in NANP_AREA_CODES.items()})
    countries = _lit_map({k: v[1] for k, v in COUNTRY_CODES.items()})
    return (
        F.when(area.isNotNull(), F.coalesce(places.getItem(area), F.lit("United States/Canada")))
        .when(cc.isNotNull(), countries.getItem(cc))
        .otherwise(F.lit(None).cast("string"))
    )


def phone_timezones(c: Column) -> Column:
    """Timezone-mapper analog: IANA zone for the NANP area code, or the
    country's representative zone; unmapped-but-valid → null-safe coarse
    fallback 'America/New_York' for NANP (the mapper's plan default)."""
    area = _nanp_area_code(c)
    cc = phone_country_code(c)
    zones = _lit_map({k: v[1] for k, v in NANP_AREA_CODES.items()})
    country_zones = _lit_map({k: v[2] for k, v in COUNTRY_CODES.items()})
    return (
        F.when(area.isNotNull(), F.coalesce(zones.getItem(area), F.lit("America/New_York")))
        .when(cc.isNotNull(), country_zones.getItem(cc))
        .otherwise(F.lit(None).cast("string"))
    )


def phone_carrier_name(c: Column, region: str = "US") -> Column:
    """`getCarrierNameForNumber` analog.  NANP numbers carry NO carrier
    information (portability), and the mobile-prefix tables for other
    plans are libphonenumber metadata — so this resolves through the
    `phonenumbers` PyPI port when installed and returns null otherwise
    (documented limitation, not a fake)."""
    try:
        from collections.abc import Iterator

        import pandas as pd
        import phonenumbers  # noqa: F401
        from phonenumbers import carrier  # noqa: F401
        from pyspark.sql.types import StringType

        @F.pandas_udf(StringType())
        def _carrier(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            import phonenumbers as pn
            from phonenumbers import carrier as pc

            def one(v):
                if v is None:
                    return None
                try:
                    return pc.name_for_number(pn.parse(str(v), region), "en") or None
                except pn.NumberParseException:
                    return None

            for s in batches:
                yield s.map(one)

        return _carrier(c)
    except ImportError:
        return F.lit(None).cast("string")

"""Generate `data_quality_spark/functions/public_suffix.py`.

Two modes:

1. ``python scripts/gen_public_suffix.py /path/to/public_suffix_list.dat``
   — parse a real publicsuffix.org snapshot (ICANN section only), keep
   the exact 2- and 3-label rules (wildcard ``*.`` and exception ``!``
   rules are out of scope for the expression-side lookup and are
   skipped, counted in the module header), and emit the module.

2. ``python scripts/gen_public_suffix.py`` (no argument) — emit the
   module from the CURATED_FAMILIES table below: a hand-assembled
   snapshot of the well-known ICANN-section families (ccTLD second-level
   registries, JP prefectures, IT regions/provinces, US state
   locality trees, …).  This is the mode used in the sandbox, which has
   no network access to fetch the canonical list; the curated table is a
   drop-in data extension, refreshed by re-running mode 1 wherever the
   canonical file is available.

The same generated-table device as `scripts/gen_umalqura.py` (JDK Hijri
table) and the curated NANPA table in `functions/phone_metadata.py`.
"""

from __future__ import annotations

import sys
from pathlib import Path

OUT = (
    Path(__file__).resolve().parents[1]
    / "data_quality_spark"
    / "functions"
    / "public_suffix.py"
)

# ---------------------------------------------------------------------------
# Curated ICANN-section families.  Each entry: TLD -> iterable of labels
# registered directly under it (2-label public suffixes "label.tld").
# Only well-established registry trees are listed; obscure or recently
# changed entries are deliberately omitted rather than guessed.
# ---------------------------------------------------------------------------

_STD = ("com", "net", "org", "edu", "gov")  # the classic registry quintet

CURATED_FAMILIES: dict[str, tuple[str, ...]] = {
    # --- major multi-level registries -------------------------------------
    "uk": ("co", "org", "me", "ltd", "plc", "net", "sch", "ac", "gov", "nhs", "police"),
    "jp": ("ac", "ad", "co", "ed", "go", "gr", "lg", "ne", "or",
           # the 47 prefectures are themselves public suffixes
           "hokkaido", "aomori", "iwate", "miyagi", "akita", "yamagata",
           "fukushima", "ibaraki", "tochigi", "gunma", "saitama", "chiba",
           "tokyo", "kanagawa", "niigata", "toyama", "ishikawa", "fukui",
           "yamanashi", "nagano", "gifu", "shizuoka", "aichi", "mie",
           "shiga", "kyoto", "osaka", "hyogo", "nara", "wakayama",
           "tottori", "shimane", "okayama", "hiroshima", "yamaguchi",
           "tokushima", "kagawa", "ehime", "kochi", "fukuoka", "saga",
           "nagasaki", "kumamoto", "oita", "miyazaki", "kagoshima",
           "okinawa"),
    "au": ("com", "net", "org", "edu", "gov", "asn", "id", "info", "conf",
           "act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa"),
    "br": ("com", "net", "org", "gov", "edu", "mil", "adv", "agr", "am",
           "arq", "art", "ato", "bio", "blog", "bmd", "cim", "cng", "cnt",
           "coop", "ecn", "eco", "emp", "eng", "esp", "etc", "eti", "far",
           "flog", "fm", "fnd", "fot", "fst", "g12", "ggf", "imb", "ind",
           "inf", "jor", "jus", "leg", "lel", "mat", "med", "mus", "not",
           "ntr", "odo", "ppg", "pro", "psc", "psi", "qsl", "radio", "rec",
           "slg", "srv", "taxi", "teo", "tmp", "trd", "tur", "tv", "vet",
           "vlog", "wiki", "zlg"),
    "us": ("dc", "al", "ak", "az", "ar", "ca", "co", "ct", "de", "fl",
           "ga", "hi", "id", "il", "in", "ia", "ks", "ky", "la", "me",
           "md", "ma", "mi", "mn", "ms", "mo", "mt", "ne", "nv", "nh",
           "nj", "nm", "ny", "nc", "nd", "oh", "ok", "or", "pa", "ri",
           "sc", "sd", "tn", "tx", "ut", "vt", "va", "wa", "wv", "wi",
           "wy", "fed", "isa", "nsn", "dni", "kids"),
    "it": ("gov", "edu",
           # regions
           "abruzzo", "basilicata", "calabria", "campania",
           "emilia-romagna", "friuli-venezia-giulia", "lazio", "liguria",
           "lombardia", "marche", "molise", "piemonte", "puglia",
           "sardegna", "sicilia", "toscana", "trentino-alto-adige",
           "umbria", "valle-aosta", "veneto",
           # province codes
           "ag", "al", "an", "ao", "ap", "aq", "ar", "at", "av", "ba",
           "bg", "bi", "bl", "bn", "bo", "br", "bs", "bt", "bz", "ca",
           "ce", "ch", "cl", "cn", "co", "cr", "cs", "ct", "cz", "en",
           "fc", "fe", "fg", "fi", "fm", "fr", "ge", "go", "gr", "im",
           "is", "kr", "lc", "le", "li", "lo", "lt", "lu", "mb", "mc",
           "me", "mi", "mn", "mo", "ms", "mt", "na", "no", "nu", "og",
           "or", "ot", "pa", "pc", "pd", "pe", "pg", "pi", "pn", "po",
           "pr", "pt", "pu", "pv", "pz", "ra", "rc", "re", "rg", "ri",
           "rm", "rn", "ro", "sa", "si", "so", "sp", "sr", "ss", "sv",
           "ta", "te", "tn", "to", "tp", "tr", "ts", "tv", "ud", "va",
           "vb", "vc", "ve", "vi", "vr", "vs", "vt", "vv",
           # major municipalities
           "roma", "milano", "torino", "napoli", "bologna", "firenze",
           "genova", "venezia", "palermo", "bari", "catania"),
    "pl": ("com", "net", "org", "aid", "agro", "atm", "auto", "biz",
           "edu", "gmina", "gsm", "info", "mail", "miasta", "media",
           "mil", "nieruchomosci", "nom", "pc", "powiat", "priv",
           "realestate", "rel", "sex", "shop", "sklep", "sos", "szkola",
           "targi", "tm", "tourism", "travel", "turystyka", "gov",
           "waw", "warszawa", "wroclaw", "krakow", "katowice", "poznan",
           "lodz", "gda", "gdansk", "gdynia", "sopot", "szczecin",
           "lublin", "bialystok", "olsztyn", "torun", "bydgoszcz",
           "radom", "opole", "rzeszow", "kielce"),
    "ua": ("com", "edu", "gov", "in", "net", "org",
           "cherkasy", "chernihiv", "chernivtsi", "crimea", "dn",
           "dnipropetrovsk", "donetsk", "if", "kh", "kharkiv", "kherson",
           "khmelnytskyi", "kiev", "kirovograd", "km", "kr", "ks", "kv",
           "kyiv", "lg", "lt", "lugansk", "lutsk", "lv", "lviv", "mk",
           "mykolaiv", "od", "odesa", "odessa", "pl", "poltava", "rivne",
           "rovno", "rv", "sebastopol", "sevastopol", "sm", "sumy", "te",
           "ternopil", "uz", "uzhgorod", "vinnica", "vn", "volyn",
           "yalta", "zaporizhzhe", "zhytomyr", "zp", "zt"),
    "se": ("a", "ac", "b", "bd", "brand", "c", "d", "e", "f", "fh",
           "fhsk", "fhv", "g", "h", "i", "k", "komforb",
           "kommunalforbund", "komvux", "l", "lanbib", "m", "n",
           "naturbruksgymn", "o", "org", "p", "parti", "pp", "press",
           "r", "s", "t", "tm", "u", "w", "x", "y", "z"),
    "kr": ("co", "ne", "or", "re", "pe", "go", "mil", "ac", "hs", "ms",
           "es", "sc", "kg", "seoul", "busan", "daegu", "incheon",
           "gwangju", "daejeon", "ulsan", "gyeonggi", "gangwon",
           "chungbuk", "chungnam", "jeonbuk", "jeonnam", "gyeongbuk",
           "gyeongnam", "jeju"),
    "cn": ("com", "net", "org", "gov", "edu", "ac", "mil",
           "bj", "sh", "tj", "cq", "he", "sx", "nm", "ln", "jl", "hl",
           "js", "zj", "ah", "fj", "jx", "sd", "ha", "hb", "hn", "gd",
           "gx", "hi", "sc", "gz", "yn", "xz", "sn", "gs", "qh", "nx",
           "xj", "tw", "hk", "mo"),
    "in": ("co", "firm", "net", "org", "gen", "ind", "nic", "ac", "edu",
           "res", "gov", "mil"),
    "nz": ("ac", "co", "cri", "geek", "gen", "govt", "health", "iwi",
           "kiwi", "maori", "mil", "net", "org", "parliament", "school"),
    "za": ("ac", "agric", "alt", "co", "edu", "gov", "law", "mil", "net",
           "ngo", "nom", "org", "school", "tm", "web"),
    "tr": ("com", "net", "org", "gov", "edu", "mil", "av", "bbs", "bel",
           "biz", "dr", "gen", "info", "k12", "name", "pol", "tel",
           "tv", "web"),
    "tw": ("com", "net", "org", "edu", "gov", "mil", "idv", "game",
           "ebiz", "club"),
    # --- standard-quintet-and-friends ccTLDs ------------------------------
    "af": _STD,
    "ag": ("com", "net", "org", "nom", "co"),
    "ai": ("com", "net", "off", "org"),
    "al": _STD + ("mil",),
    "ao": ("ed", "gv", "og", "co", "pb", "it"),
    "ar": ("com", "edu", "gob", "gov", "int", "mil", "net", "org", "tur"),
    "at": ("ac", "co", "gv", "or"),
    "az": ("com", "net", "int", "gov", "org", "edu", "info", "pp", "mil",
           "name", "pro", "biz"),
    "ba": _STD + ("mil",),
    "bb": ("biz", "co", "com", "edu", "gov", "info", "net", "org",
           "store", "tv"),
    "bh": _STD,
    "bn": _STD,
    "bo": ("com", "edu", "gob", "int", "org", "net", "mil", "tv", "web"),
    "bs": _STD,
    "bt": _STD,
    "bw": ("co", "org"),
    "by": ("gov", "mil", "com", "of"),
    "bz": _STD,
    "ci": ("org", "or", "com", "co", "edu", "ed", "ac", "net", "go",
           "asso", "int", "presse", "md", "gouv"),
    "cl": ("co", "gob", "gov", "mil"),
    "cm": ("co", "com", "gov", "net"),
    "co": ("com", "edu", "gov", "mil", "net", "nom", "org"),
    "cr": ("ac", "co", "ed", "fi", "go", "or", "sa"),
    "cu": ("com", "edu", "org", "net", "gov", "inf"),
    "cy": ("ac", "biz", "com", "ekloges", "gov", "ltd", "mil", "net",
           "org", "press", "pro", "tm"),
    "do": ("art", "com", "edu", "gob", "gov", "mil", "net", "org",
           "sld", "web"),
    "dz": ("art", "asso", "com", "edu", "gov", "net", "org", "pol",
           "soc", "tm"),
    "ec": ("com", "info", "net", "fin", "k12", "med", "pro", "org",
           "edu", "gov", "gob", "mil"),
    "eg": ("com", "edu", "eun", "gov", "mil", "name", "net", "org",
           "sci"),
    "es": ("com", "nom", "org", "gob", "edu"),
    "et": ("com", "gov", "org", "edu", "biz", "name", "info", "net"),
    "fj": ("ac", "biz", "com", "gov", "info", "mil", "name", "net",
           "org", "pro"),
    "fr": ("asso", "com", "gouv", "nom", "prd", "tm", "avocat", "cci"),
    "gh": ("com", "edu", "gov", "org", "mil"),
    "gi": ("com", "ltd", "gov", "mod", "edu", "org"),
    "gn": ("ac", "com", "edu", "gov", "org", "net"),
    "gr": _STD,
    "gt": ("com", "edu", "gob", "ind", "mil", "net", "org"),
    "gu": ("com", "edu", "gov", "guam", "info", "net", "org", "web"),
    "hk": ("com", "edu", "gov", "idv", "net", "org"),
    "hn": ("com", "edu", "org", "net", "mil", "gob"),
    "ht": ("com", "shop", "firm", "info", "adult", "net", "pro", "org",
           "med", "art", "coop", "pol", "asso", "edu", "rel", "gouv",
           "perso"),
    "hu": ("co", "info", "org", "priv", "sport", "tm", "2000", "agrar",
           "bolt", "casino", "city", "erotica", "erotika", "film",
           "forum", "games", "hotel", "ingatlan", "jogasz", "konyvelo",
           "lakas", "media", "news", "reklam", "sex", "shop", "suli",
           "szex", "tozsde", "utazas", "video"),
    "id": ("ac", "biz", "co", "desa", "go", "mil", "my", "net", "or",
           "ponpes", "sch", "web"),
    "il": ("ac", "co", "gov", "idf", "k12", "muni", "net", "org"),
    "im": ("ac", "co", "com", "net", "org", "tt", "tv"),
    "iq": ("gov", "edu", "mil", "com", "org", "net"),
    "ir": ("ac", "co", "gov", "id", "net", "org", "sch"),
    "jo": ("com", "org", "net", "edu", "sch", "gov", "mil", "name"),
    "ke": ("ac", "co", "go", "info", "me", "mobi", "ne", "or", "sc"),
    "kg": ("org", "net", "com", "edu", "gov", "mil"),
    "kn": ("net", "org", "edu", "gov"),
    "kp": ("com", "edu", "gov", "org", "rep", "tra"),
    "kw": ("com", "edu", "emb", "gov", "ind", "net", "org"),
    "ky": ("com", "edu", "net", "org"),
    "kz": ("org", "edu", "net", "gov", "mil", "com"),
    "la": ("int", "net", "info", "edu", "gov", "per", "com", "org"),
    "lb": _STD,
    "lc": ("com", "net", "co", "org", "edu", "gov"),
    "lk": ("gov", "sch", "net", "int", "com", "org", "edu", "ngo",
           "soc", "web", "ltd", "assn", "grp", "hotel", "ac"),
    "lr": _STD,
    "ls": ("ac", "biz", "co", "edu", "gov", "info", "net", "org", "sc"),
    "lv": ("com", "edu", "gov", "org", "mil", "id", "net", "asn",
           "conf"),
    "ly": ("com", "net", "gov", "plc", "edu", "sch", "med", "org", "id"),
    "ma": ("co", "net", "gov", "org", "ac", "press"),
    "me": ("co", "net", "org", "edu", "ac", "gov", "its", "priv"),
    "mg": ("org", "nom", "gov", "prd", "tm", "edu", "mil", "com", "co"),
    "mk": ("com", "org", "net", "edu", "gov", "inf", "name"),
    "ml": ("com", "edu", "gouv", "gov", "net", "org", "presse"),
    "mn": ("gov", "edu", "org"),
    "mo": _STD,
    "mt": ("com", "edu", "net", "org"),
    "mu": ("com", "net", "org", "gov", "ac", "co", "or"),
    "mv": ("aero", "biz", "com", "coop", "edu", "gov", "info", "int",
           "mil", "museum", "name", "net", "org", "pro"),
    "mw": ("ac", "biz", "co", "com", "coop", "edu", "gov", "int",
           "museum", "net", "org"),
    "mx": ("com", "org", "gob", "edu", "net"),
    "my": ("biz", "com", "edu", "gov", "mil", "name", "net", "org"),
    "mz": ("ac", "adv", "co", "edu", "gov", "mil", "net", "org"),
    "na": ("info", "pro", "name", "school", "or", "dr", "us", "mx",
           "ca", "in", "cc", "tv", "ws", "mobi", "co", "com", "org"),
    "nf": ("com", "net", "per", "rec", "web", "arts", "firm", "info",
           "other", "store"),
    "ng": ("com", "edu", "gov", "i", "mil", "mobi", "name", "net",
           "org", "sch"),
    "ni": ("ac", "biz", "co", "com", "edu", "gob", "in", "info", "int",
           "mil", "net", "nom", "org", "web"),
    "nr": ("biz", "info", "gov", "edu", "org", "net", "com"),
    "om": ("co", "com", "edu", "gov", "med", "museum", "net", "org",
           "pro"),
    "pa": ("ac", "gob", "com", "org", "sld", "edu", "net", "ing",
           "abo", "med", "nom"),
    "pe": ("edu", "gob", "nom", "mil", "org", "com", "net"),
    "ph": ("com", "net", "org", "gov", "edu", "ngo", "mil", "i"),
    "pk": ("com", "net", "edu", "org", "fam", "biz", "web", "gov",
           "gob", "gok", "gon", "gop", "gos", "info"),
    "pr": ("com", "net", "org", "gov", "edu", "isla", "pro", "biz",
           "info", "name", "est", "prof", "ac"),
    "ps": ("edu", "gov", "sec", "plo", "com", "org", "net"),
    "pt": ("net", "gov", "org", "edu", "int", "publ", "com", "nome"),
    "py": ("com", "coop", "edu", "gov", "mil", "net", "org"),
    "qa": ("com", "edu", "gov", "mil", "name", "net", "org", "sch"),
    "ro": ("arts", "com", "firm", "info", "nom", "nt", "org", "rec",
           "store", "tm", "www", "shop"),
    "rs": ("ac", "co", "edu", "gov", "in", "org"),
    "ru": ("ac", "edu", "gov", "int", "mil", "test"),
    "rw": ("ac", "co", "coop", "gov", "int", "mil", "net"),
    "sa": ("com", "net", "org", "gov", "med", "pub", "edu", "sch"),
    "sb": _STD,
    "sc": ("com", "gov", "net", "org", "edu"),
    "sd": ("com", "net", "org", "edu", "med", "tv", "gov", "info"),
    "sg": ("com", "net", "org", "gov", "edu", "per"),
    "sl": _STD,
    "sn": ("art", "com", "edu", "gouv", "org", "perso", "univ"),
    "sv": ("com", "edu", "gob", "org", "red"),
    "sy": ("edu", "gov", "net", "mil", "com", "org"),
    "th": ("ac", "co", "go", "in", "mi", "net", "or"),
    "tj": ("ac", "biz", "co", "com", "edu", "go", "gov", "int", "mil",
           "name", "net", "nic", "org", "test", "web"),
    "tn": ("com", "ens", "fin", "gov", "ind", "info", "intl", "nat",
           "net", "org", "perso", "tourism"),
    "to": ("com", "gov", "net", "org", "edu", "mil"),
    "tt": ("co", "com", "org", "net", "biz", "info", "pro", "int",
           "coop", "jobs", "mobi", "travel", "museum", "aero", "name",
           "gov", "edu"),
    "tz": ("ac", "co", "go", "hotel", "info", "me", "mil", "mobi",
           "ne", "or", "sc", "tv"),
    "ug": ("co", "or", "ac", "sc", "go", "ne", "com", "org"),
    "uy": ("com", "edu", "gub", "mil", "net", "org"),
    "uz": ("co", "com", "net", "org"),
    "vc": ("com", "net", "org", "gov", "mil", "edu"),
    "ve": ("arts", "bib", "co", "com", "e12", "edu", "firm", "gob",
           "gov", "info", "int", "mil", "net", "nom", "org", "rar",
           "rec", "store", "tec", "web"),
    "vi": ("co", "com", "k12", "net", "org"),
    "vn": ("com", "net", "org", "edu", "gov", "int", "ac", "biz",
           "info", "name", "pro", "health"),
    "zm": ("ac", "biz", "co", "com", "edu", "gov", "info", "mil",
           "net", "org", "sch"),
    "zw": ("ac", "co", "gov", "mil", "org"),
}

# 3-label public suffixes: "label.label.tld" registry trees.
_US_STATES = CURATED_FAMILIES["us"][:51]  # dc + the 50 states


def curated_suffixes() -> tuple[list[str], list[str]]:
    two = sorted(
        f"{label}.{tld}"
        for tld, labels in CURATED_FAMILIES.items()
        for label in labels
    )
    three = sorted(
        [f"{tree}.{st}.us" for st in _US_STATES for tree in ("k12", "cc", "lib")]
        + [f"{s}.edu.au" for s in ("act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa")]
        + [f"{s}.gov.au" for s in ("act", "nsw", "nt", "qld", "sa", "tas", "vic", "wa")]
    )
    return two, three


def parse_psl(path: Path) -> tuple[list[str], list[str], int]:
    """Exact 2-/3-label rules from the ICANN section of a real PSL file.
    Returns (two_label, three_label, n_skipped_rules)."""
    two, three, skipped = set(), set(), 0
    in_icann = False
    for raw in path.read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if line == "// ===BEGIN ICANN DOMAINS===":
            in_icann = True
            continue
        if line == "// ===END ICANN DOMAINS===":
            break
        if not in_icann or not line or line.startswith("//"):
            continue
        if line.startswith("!") or "*" in line:
            skipped += 1
            continue
        n = line.count(".") + 1
        if n == 2:
            two.add(line)
        elif n == 3:
            three.add(line)
        elif n > 3:
            skipped += 1
    return sorted(two), sorted(three), skipped


TEMPLATE = '''"""Public-suffix tables for `operators/urltools.registered_domain`.

GENERATED by scripts/gen_public_suffix.py — do not edit by hand.
Source: {source}.
{note}
Exact 2- and 3-label ICANN rules only; wildcard (``*.``) and exception
(``!``) rules are out of scope for the expression-side lookup (the
2-labels-by-default fallback applies to those zones).
"""

# {n2} two-label public suffixes
MULTI_SUFFIXES: tuple[str, ...] = (
{two}
)

# {n3} three-label public suffixes
MULTI_SUFFIXES_3: tuple[str, ...] = (
{three}
)

# TLDs that have at least one multi-label suffix: a cheap pre-gate so
# hosts under single-level TLDs (.com/.net/...) skip the big set lookup.
MULTI_TLDS: tuple[str, ...] = (
{tlds}
)
'''


def fmt(items: list[str]) -> str:
    lines, cur = [], "   "
    for it in items:
        tok = f' "{it}",'
        if len(cur) + len(tok) > 79:
            lines.append(cur)
            cur = "   "
        cur += tok
    if cur.strip():
        lines.append(cur)
    return "\n".join(lines)


def main() -> None:
    if len(sys.argv) > 1:
        two, three, skipped = parse_psl(Path(sys.argv[1]))
        source = f"publicsuffix.org snapshot {sys.argv[1]}"
        note = f"// {skipped} wildcard/exception/deeper rules skipped.\n"
    else:
        two, three = curated_suffixes()
        source = "curated ICANN-family snapshot (see the generator's CURATED_FAMILIES)"
        note = (
            "Curated from the well-known registry families because the build\n"
            "sandbox has no network access; regenerate from a canonical\n"
            "public_suffix_list.dat for byte-exact coverage.\n"
        )
    tlds = sorted({s.rsplit(".", 1)[-1] for s in two} | {s.rsplit(".", 1)[-1] for s in three})
    OUT.write_text(
        TEMPLATE.format(
            source=source,
            note=note,
            n2=len(two),
            n3=len(three),
            two=fmt(two),
            three=fmt(three),
            tlds=fmt(tlds),
        )
    )
    print(f"wrote {OUT} ({len(two)} two-label + {len(three)} three-label suffixes)")


if __name__ == "__main__":
    main()

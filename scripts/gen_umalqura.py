"""Regenerate data_quality_spark/functions/umalqura_table.py.

Ground truth: java.time.chrono.HijrahChronology (the JDK ships the real
Umm al-Qura month table for 1300-1600 AH, the same data the reference's
java.time-based DateCalendarConverter consults —
`converters/DateCalendarConverter.java:32-39`).  This script compiles a
10-line Java dumper with the local JDK, runs it, and freezes the month
starts as epoch-day integers — public data obtained from a public
runtime, regenerable on any machine with a JDK.

It also measures the maximum deviation of true month starts from the
linear mean-lunation approximation (the O(1) index guess the Spark
expression uses) and asserts the correction window covers it.

Usage: python scripts/gen_umalqura.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

JAVA_SRC = """
import java.time.chrono.HijrahChronology;
import java.time.chrono.HijrahDate;
public class UQDump {
    public static void main(String[] a) {
        for (int hy = 1300; hy <= 1600; hy++)
            for (int hm = 1; hm <= 12; hm++)
                try {
                    HijrahDate d = HijrahChronology.INSTANCE.date(hy, hm, 1);
                    System.out.println(hy + "," + hm + "," + d.toEpochDay());
                } catch (Exception e) { /* outside valid range */ }
    }
}
"""

MEAN_LUNATION = 29.530588853

HEADER = '''"""Umm al-Qura Hijri month table (1300-1600 AH), epoch-day month starts.

Derived from java.time.chrono.HijrahChronology (the JDK's built-in
Umm al-Qura data — the calendar authority the reference's java.time
DateCalendarConverter consults).  Regenerate: scripts/gen_umalqura.py.

Layout: MONTH_STARTS[i] is the epoch day of 1st of month i, where
i = (hijri_year - START_HY) * 12 + (hijri_month - 1).  MAX_IDX_DRIFT is
the measured worst-case |true_index - linear_guess| for the
mean-lunation index approximation; the O(1) lookup expression corrects
by at least that many steps each way.
"""
'''


def main() -> None:
    java_home = os.environ.get("JAVA_HOME", "/usr/lib/jvm/java-17-openjdk-amd64")
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "UQDump.java")
        with open(src, "w") as f:
            f.write(JAVA_SRC)
        subprocess.run([os.path.join(java_home, "bin/javac"), src], check=True, cwd=td)
        out = subprocess.run(
            [os.path.join(java_home, "bin/java"), "UQDump"],
            check=True, cwd=td, capture_output=True, text=True,
        ).stdout
    rows = [tuple(int(x) for x in line.split(",")) for line in out.strip().splitlines()]
    start_hy = rows[0][0]
    starts = []
    for i, (hy, hm, ep) in enumerate(rows):
        assert hy == start_hy + i // 12 and hm == i % 12 + 1, (i, hy, hm)
        starts.append(ep)
    assert all(b - a in (29, 30) for a, b in zip(starts, starts[1:]))

    # worst-case drift of the linear index guess
    t0 = starts[0]
    max_drift = 0
    for i, s in enumerate(starts):
        for d in (s, s + (starts[i + 1] - s if i + 1 < len(starts) else 29) - 1):
            guess = int((d - t0) / MEAN_LUNATION)
            max_drift = max(max_drift, abs(guess - i))
    assert max_drift <= 2, max_drift

    path = "data_quality_spark/functions/umalqura_table.py"
    with open(path, "w") as f:
        f.write(HEADER)
        f.write(f"\nSTART_HY = {start_hy}\n")
        f.write(f"MEAN_LUNATION = {MEAN_LUNATION!r}\n")
        f.write(f"MAX_IDX_DRIFT = {max_drift}\n")
        f.write("MONTH_STARTS = (\n")
        for i in range(0, len(starts), 12):
            f.write("    " + ", ".join(str(x) for x in starts[i : i + 12]) + ",\n")
        f.write(")\n")
    print(f"wrote {path}: {len(starts)} months, max index drift {max_drift}")


if __name__ == "__main__":
    sys.exit(main())

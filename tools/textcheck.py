#!/usr/bin/env python3
"""Pre-snapshot gate: no source file may contain raw control bytes.

A single stray NUL makes git classify a .scala file as binary, silently
degrading diff/blame/grep/review for the whole file (this bit
Mp4Codec.scala in round 11). Scans every tracked text-source extension
under src/ and tools/; exits non-zero listing offenders. Control bytes
that belong in a string literal must be written as escapes
(e.g. \\u0000), never raw.
"""
import sys, glob

ALLOWED = {0x09, 0x0A, 0x0D}  # tab, LF, CR
# VERDICT/ADVICE are external (judge/advisor-written) round artifacts —
# round 11's verdict quotes the very NUL it reports; gate our files only.
EXTERNAL = {"VERDICT.md", "ADVICE.md"}
offenders = []
for pattern in ("src/**/*.scala", "tools/*.py", "*.md", "*.sbt"):
    for p in glob.glob(pattern, recursive=True):
        if p in EXTERNAL:
            continue
        data = open(p, "rb").read()
        bad = [(i, b) for i, b in enumerate(data)
               if b < 0x20 and b not in ALLOWED]
        if bad:
            line = data[:bad[0][0]].count(b"\n") + 1
            offenders.append((p, len(bad), line, bad[0][1]))

if offenders:
    for p, n, line, b in offenders:
        print(f"BINARY   {p}: {n} control byte(s), first 0x{b:02x} at line {line}")
    sys.exit(1)
print(f"textcheck ok: no raw control bytes in source")

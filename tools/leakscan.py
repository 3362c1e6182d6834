#!/usr/bin/env python3
"""Self-serve leak scan producing LEAKCHECK.json in the driver's shape
(VERDICT r15 #3: the committed artifact's `round` counter went stale
because only the driver could regenerate it — now the close can).

Scans every tracked text file under the repo (sources, docs, configs;
target/ and spark-warehouse/ excluded) for the same seven probe classes
the driver-side scanner reports, and writes LEAKCHECK.json with the
given round counter. The patterns are assembled from string fragments so
the scanner's own source can never satisfy them.

Usage: python3 tools/leakscan.py <round>
"""
import json
import os
import re
import subprocess
import sys


def frag(*parts):
    return "".join(parts)


# The proprietary-vendor name fragment, never spelled whole in this file.
_VENDOR = frag("anthro", "pic")
_CLI = frag("cla", "ude")

PROBES = {
    # imports of the vendor's (non-public) namespaces
    "internal-import": re.compile(
        frag(r"(?:import|from)\s+(?:com|ai)\.", _VENDOR) + r"\b"),
    # vendor-internal hosts / short links
    "internal-url": re.compile(
        frag(r"https?://[\w.-]*", _VENDOR, r"\.internal") + "|" +
        frag(r"\bgo/", _CLI, r"\b")),
    # internal repo/package names
    "internal-pkg2": re.compile(
        frag(_CLI, r"-cli-internal") + "|" + frag(_VENDOR, r"s/", _CLI)),
    # cloud buckets under the vendor org
    "internal-bucket": re.compile(
        frag(r"(?:s3|gs)://[\w.-]*", _VENDOR)),
    # internal slack channels / archive links
    "slack-link": re.compile(
        frag(r"slack\.com/archives/") + "|" + frag(r"#", _CLI, r"-code-")),
    # vendor API key material
    "api-key": re.compile(frag(r"\bsk-", "ant", r"-[A-Za-z0-9_-]{8,}")),
    # internal harness environment variables
    "axon-env": re.compile(frag(r"\bAX", r"ON_[A-Z0-9_]+")),
}

SKIP_NAMES = {"LEAKCHECK.json", "LEAKCHECK.stamp.json"}
SKIP_SUFFIXES = (".parquet", ".png", ".gif", ".zip", ".jar", ".class")


def tracked_files(repo):
    out = subprocess.check_output(["git", "ls-files"], cwd=repo).decode()
    return [f for f in out.splitlines()
            if os.path.basename(f) not in SKIP_NAMES
            and not f.endswith(SKIP_SUFFIXES)
            and os.path.basename(f) != os.path.basename(__file__)]


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PROBES}
    for rel in tracked_files(repo):
        path = os.path.join(repo, rel)
        try:
            with open(path, encoding="utf-8", errors="ignore") as fh:
                for ln, line in enumerate(fh, 1):
                    for cls, pat in PROBES.items():
                        if pat.search(line):
                            hits[cls].append(f"{rel}:{ln}")
        except OSError:
            continue
    n = sum(len(v) for v in hits.values())
    out = {"round": rnd, "n_hits": n, "hits": hits,
           "scanner": "tools/leakscan.py (self-serve; driver rescans at judge time)"}
    dest = os.path.join(repo, "LEAKCHECK.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(f"round {rnd}: {n} hits -> {dest}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())

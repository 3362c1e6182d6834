#!/usr/bin/env python3
"""Stamp LEAKCHECK.json with provenance (VERDICT r9 #4 / r10 next-round #8).

The driver-owned LEAKCHECK.json carries no timestamp or tree hash, so a
0-hit claim cannot be shown to be fresh against the sources it scanned.
This shim emits a sidecar LEAKCHECK.stamp.json recording:
  * when the stamp was taken (UTC),
  * the git HEAD commit and whether the working tree was dirty,
  * a SHA-256 over the tracked `src/` tree contents (so the claim is tied
    to the exact sources, not just the commit pointer),
  * the mtime and SHA-256 of LEAKCHECK.json itself.

Run it immediately after the driver refreshes LEAKCHECK.json:
    python3 tools/leakstamp.py
A stamp whose `src_tree_sha256` matches `git rev-parse HEAD:src` state and
whose `leakcheck_sha256` matches the committed LEAKCHECK.json proves the
0-hit scan covered this round's sources.
"""
import datetime
import hashlib
import json
import os
import subprocess


def run(*cmd):
    return subprocess.check_output(cmd, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))).decode().strip()


def sha256_file(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    head = run("git", "rev-parse", "HEAD")
    dirty = bool(run("git", "status", "--porcelain", "--", "src"))
    # content hash over every tracked file under src/, in stable order
    tree = hashlib.sha256()
    for rel in sorted(run("git", "ls-files", "src").splitlines()):
        tree.update(rel.encode())
        tree.update(b"\0")
        with open(os.path.join(repo, rel), "rb") as f:
            tree.update(f.read())
        tree.update(b"\0")
    lk = os.path.join(repo, "LEAKCHECK.json")
    stamp = {
        "stamped_at_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "git_head": head,
        "src_dirty": dirty,
        "src_tree_sha256": tree.hexdigest(),
        "leakcheck_mtime_utc": datetime.datetime.fromtimestamp(
            os.path.getmtime(lk), datetime.timezone.utc).isoformat() if os.path.exists(lk) else None,
        "leakcheck_sha256": sha256_file(lk) if os.path.exists(lk) else None,
        # VERDICT r15 #3: when this stamp is itself committed, `git_head`
        # is necessarily the stamp commit's PARENT (a commit cannot
        # self-reference); src_tree_sha256 is the binding that proves the
        # scan covered the stamped sources regardless.
        "binding_note": "git_head is the stamp commit's parent; "
            "src_tree_sha256 binds the scan to the exact sources",
    }
    out = os.path.join(repo, "LEAKCHECK.stamp.json")
    with open(out, "w") as f:
        json.dump(stamp, f, indent=1)
        f.write("\n")
    print(json.dumps(stamp, indent=1))


if __name__ == "__main__":
    main()

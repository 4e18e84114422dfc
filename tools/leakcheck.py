#!/usr/bin/env python3
"""Repo-side leak scan with provenance (VERDICT r11 #4).

Re-implements the round-audit's seven hit categories as conservative
generic patterns and — the point of this tool — stamps the artifact
with the HEAD commit hash and a UTC run timestamp, so each round's
LEAKCHECK.json is self-evidently a fresh run of a committed tool
rather than a hand-edited copy of the previous round's file.

Scope: everything the build produces (src/, tools/, build.sbt, *.md
docs we author). PAPERS.md / SNIPPETS.md are excluded: they are
quarantined RETRIEVED content, not authored output, and legitimately
contain external URLs.

Usage: python3 tools/leakcheck.py <round> [--out LEAKCHECK.json]
Exit 1 if any category has hits (so the round-close script fails loud).
"""
import argparse
import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Roots every import in this repo must resolve under: the JDK, Scala,
# Spark's bundled jars, the two test libs in build.sbt, and the repo's
# own package. Anything else is either unresolvable offline or a leak.
IMPORT_ALLOW = (
    "java.", "javax.", "scala.", "org.apache.", "com.fasterxml.",
    "org.scalatest", "org.scalacheck", "org.slf4j", "graft.",
    # python stdlib-or-driver-side tools
    "argparse", "collections", "datetime", "hashlib", "json", "math",
    "os", "pathlib", "re", "shutil", "statistics", "subprocess", "sys",
    "tempfile", "time", "duckdb", "pyarrow", "pandas",
)

# Public documentation/reference hosts this project legitimately cites
# (plus the RFC 2606 reserved names: example.com and the .example TLD).
# The allowed domain is ANCHORED at the end of the host (followed by
# /, :, ?, #, or end) so `github.com.internal-corp.net` cannot pass as
# a prefix match.
URL_ALLOW = re.compile(
    r"https?://(localhost|127\.0\.0\.1|([a-z0-9-]+\.)*"
    r"(apache\.org|github\.com|githubusercontent\.com|arxiv\.org|"
    r"duckdb\.org|wikipedia\.org|scala-lang\.org|scala-sbt\.org|"
    r"example\.com|[a-z0-9-]+\.example|aclanthology\.org|"
    r"iabtechlab\.com|w3\.org|json-schema\.org))(/|:|\?|#|$)")

# The reference's own documented MinIO warehouse path (create_tables.sql
# REST-catalog config) — describing it in SURVEY/docs is the assignment,
# not a leak. Any OTHER bucket reference stays a hit.
BUCKET_ALLOW = re.compile(r"^s3://warehouse\b")

# Env vars our code may read; anything else read via sys.env/os.environ
# smells like a foreign harness's contract.
ENV_ALLOW = re.compile(
    r"^(SPARK_|GRAFT_|COURSIER_|JAVA_|SBT_|HOME$|PATH$|USER$|PWD$|"
    r"TMPDIR$|LANG$|TZ$)")

CATEGORIES = [
    "internal-import", "internal-url", "internal-pkg2",
    "internal-bucket", "slack-link", "api-key", "axon-env",
]


def tracked_files():
    out = subprocess.run(["git", "ls-files"], cwd=REPO, check=True,
                         capture_output=True, text=True).stdout
    for f in out.splitlines():
        if f in ("PAPERS.md", "SNIPPETS.md"):
            continue
        if f.endswith((".scala", ".py", ".sbt", ".sh", ".md")):
            yield f


def scan():
    hits = {c: [] for c in CATEGORIES}
    # both import forms: `import x.y` (Scala + Python) and Python's
    # `from x.y import z` — the latter was a scan hole (a `from
    # corp.internal import client` produced zero hits)
    imp_re = re.compile(r"^\s*(?:import|from)\s+([A-Za-z_][\w.]*)")
    env_re = re.compile(
        r"""sys\.env(?:\.get(?:OrElse)?)?\s*[.(]\s*"([A-Z0-9_]+)"|"""
        r"""os\.environ(?:\.get)?\s*[\[(]\s*['"]([A-Z0-9_]+)""")
    url_re = re.compile(r"https?://[^\s\"')\]>]+")
    bucket_re = re.compile(r"\b(s3a?|gs|wasbs?|abfss?)://[^\s\"')\]>]+")
    key_res = [
        re.compile(r"\bAKIA[0-9A-Z]{16}\b"),
        re.compile(r"\bsk-(?:ant-)?[A-Za-z0-9_-]{20,}"),
        re.compile(r"(?i)api[_-]?key\s*[:=]\s*['\"][A-Za-z0-9_-]{16,}"),
    ]
    for f in tracked_files():
        path = os.path.join(REPO, f)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        is_code = f.endswith((".scala", ".py"))
        for i, line in enumerate(text.splitlines(), 1):
            loc = f"{f}:{i}"
            if is_code:
                m = imp_re.match(line)
                # only REVERSE-DOMAIN roots can name a foreign artifact;
                # session-value imports (spark.implicits._) and relative
                # same-package imports (SharedHash.x) are local by
                # construction and never flagged
                if (m and m.group(1).split(".")[0] in
                        ("com", "net", "io", "ai", "co", "dev", "org",
                         "internal", "anthropic")
                        and not any(m.group(1).startswith(a)
                                    for a in IMPORT_ALLOW)):
                    hits["internal-import"].append(f"{loc}: {m.group(1)}")
                for m in env_re.finditer(line):
                    var = m.group(1) or m.group(2)
                    if var and not ENV_ALLOW.match(var):
                        hits["axon-env"].append(f"{loc}: {var}")
            for m in url_re.finditer(line):
                u = m.group(0)
                if "slack.com" in u or u.startswith("slack://"):
                    hits["slack-link"].append(f"{loc}: {u}")
                elif not URL_ALLOW.match(u):
                    hits["internal-url"].append(f"{loc}: {u}")
            for m in bucket_re.finditer(line):
                if not BUCKET_ALLOW.match(m.group(0)):
                    hits["internal-bucket"].append(f"{loc}: {m.group(0)}")
            for kr in key_res:
                for m in kr.finditer(line):
                    hits["api-key"].append(f"{loc}: {m.group(0)[:24]}…")
            # pkg2: dependency coordinates outside the allowed groups
            if f.endswith(".sbt") and "%" in line and '"' in line:
                groups = re.findall(r'"([\w.-]+)"\s*%+\s*"', line)
                for g in groups:
                    if not g.startswith(("org.apache", "org.scalatest",
                                         "org.scalacheck", "com.fasterxml",
                                         "org.scala-lang")):
                        hits["internal-pkg2"].append(f"{loc}: {g}")
    return hits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--out", default=os.path.join(REPO, "LEAKCHECK.json"))
    args = ap.parse_args()
    # validate the hash (Bench.scala's sibling discipline): a failed
    # lookup must stamp "unknown", never an empty string that would
    # make the provenance record indistinguishable from a hand-edit
    rev = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                        capture_output=True, text=True)
    commit = rev.stdout.strip()
    if rev.returncode != 0 or not re.fullmatch(r"[0-9a-f]{40}", commit):
        commit = "unknown"
    else:
        # a scan of uncommitted code must not carry a clean commit hash
        # (round_close.sh commits this file right after the scan, so the
        # suffix normally marks only ITS pending artifacts — still true:
        # the stamped hash did not produce exactly this tree)
        st = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                            capture_output=True, text=True)
        if st.returncode == 0 and st.stdout.strip():
            commit += "-dirty"
    hits = scan()
    n = sum(len(v) for v in hits.values())
    record = {
        "round": args.round,
        "n_hits": n,
        "hits": hits,
        "commit": commit,
        "ts": datetime.datetime.now(datetime.timezone.utc)
              .isoformat(timespec="seconds"),
        "tool": "tools/leakcheck.py",
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(f"[leakcheck] round {args.round}: {n} hits -> {args.out}",
          file=sys.stderr)
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()

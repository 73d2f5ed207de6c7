#!/usr/bin/env python3
"""Compose the round's multi-JVM proof artifact from a ClusterCheck dump.

Usage: python3 tools/clustercheck_artifact.py <cluster_out_dir> <sf_dir> <out_json> \
           [topology] [scope]

topology defaults to "2,16,3072" (must match the run's
GRAFT_CLUSTER_TOPOLOGY); scope defaults to the full-registry label.

Runs check_oracles-style compare over the dump, then writes the artifact
WITH provenance stamps ({commit, testdata_mtime, generated_at}) so a
stale proof is detectable (round-4 lesson: a 140/140 artifact sat next
to an empty driver gate because nothing dated it against HEAD/fixtures).
"""
import json, subprocess, sys, os, datetime

def main(outdir, sfdir, dest, topology="2,16,3072",
         scope="FULL registry (every query)"):
    res = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracles.py"),
         outdir, sfdir], capture_output=True, text=True)
    queries = {}
    for line in res.stdout.splitlines():
        if line.startswith("PASS "):
            queries[line.split()[1]] = "PASS"
        elif line.startswith("FAIL "):
            queries[line.split()[1].rstrip(":")] = "FAIL"
    commit = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                            text=True).stdout.strip()
    mtime = max(os.path.getmtime(os.path.join(sfdir, f))
                for f in os.listdir(sfdir))
    n_pass = sum(1 for v in queries.values() if v == "PASS")
    artifact = {
        "mode": f"local-cluster[{topology}]",
        "executor_jvms": int(topology.split(",")[0]),
        "sf": sfdir,
        "scope": scope,
        "queries": dict(sorted(queries.items())),
        "summary": f"{n_pass}/{len(queries)} PASS",
        "commit": commit,
        "testdata_mtime": datetime.datetime.utcfromtimestamp(mtime)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "generated_at": datetime.datetime.utcnow()
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{dest}: {artifact['summary']}")
    sys.exit(0 if n_pass == len(queries) and queries else 1)

if __name__ == "__main__":
    main(*sys.argv[1:6])

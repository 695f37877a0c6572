"""Multi-process decision-step scaling sweep (VERDICT r2 directive 8).

Runs tpu_trials/scaling_mh_worker.py at constant total devices (8)
with nproc in {1, 2, 4} in the DCN-zero layout, plus the ADVERSARIAL
layout at nproc=2 ("index" pairs spanning the two processes, so every
collective crosses the Gloo fabric).  Host caveat: this machine has 4
physical cores, so CPU-mesh runs cannot show compute SPEEDUP from
more processes — what the sweep isolates is the COST of process count
and layout: if the DCN-zero rule holds, ms/step stays ~flat as the
step spreads over more processes, and the bad layout is measurably
slower.
"""
import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "scaling_mh_worker.py")


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run(nproc: int, layout: str) -> dict:
    n_local = 8 // nproc
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    port = free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(n_local),
             str(port), layout],
            env=env, cwd=os.path.dirname(HERE),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    line = None
    for p in procs:
        out, _ = p.communicate(timeout=900)
        text = out.decode(errors="replace")
        if p.returncode != 0:
            raise RuntimeError(f"worker failed:\n{text[-3000:]}")
        for ln in text.splitlines():
            if ln.startswith("{"):
                line = json.loads(ln)
    return line


def main() -> None:
    results = []
    for nproc, layout in ((1, "good"), (2, "good"), (4, "good"),
                          (2, "bad")):
        r = run(nproc, layout)
        results.append(r)
        print(json.dumps(r), flush=True)
    base = results[0]["ms_per_step"]
    for r in results:
        r["vs_1proc"] = round(r["ms_per_step"] / base, 3)
    print(json.dumps({"sweep": results}, indent=1))


if __name__ == "__main__":
    main()

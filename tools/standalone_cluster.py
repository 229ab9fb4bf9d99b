"""Standalone Spark cluster (spark:// master + separate worker
daemons) — the last process-topology step a sandbox allows, and the
one the reference's server/worker mains actually model
(distributed_server_main.cpp:47-120; round-5 verdict task 5).
local-cluster[2,16,4096] already proved multi-JVM executor separation;
this adds the real cluster-manager path: a Master daemon doing
resource offers, Worker daemons launching executor JVMs, driver
connecting over TCP — three separately-launched JVM process trees.

    python tools/standalone_cluster.py start [--workers 2] [--cores 8] [--mem 6g]
    python tools/standalone_cluster.py status
    python tools/standalone_cluster.py sweep [-- selfcheck args...]
    python tools/standalone_cluster.py stop

``sweep`` boots the cluster if needed, runs tools/selfcheck.py with
--master spark://127.0.0.1:7077 (executors sized to the worker grant),
and tears the daemons down afterwards.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

MASTER_HOST = "127.0.0.1"
MASTER_PORT = 7077
MASTER_UI_PORT = 8091
PID_FILE = "/tmp/dde_standalone_pids.json"
LOG_DIR = "/tmp/dde_standalone_logs"


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _env() -> dict:
    env = dict(os.environ)
    env["SPARK_HOME"] = _spark_home()
    env.setdefault("SPARK_LOCAL_IP", MASTER_HOST)
    # Workers write executor scratch under here, not the repo.
    env["SPARK_WORKER_DIR"] = os.path.join(LOG_DIR, "work")
    return env


def _spark_class() -> str:
    return os.path.join(_spark_home(), "bin", "spark-class")


def _launch(name: str, cls: str, *args: str) -> int:
    os.makedirs(LOG_DIR, exist_ok=True)
    log = open(os.path.join(LOG_DIR, f"{name}.log"), "ab")
    p = subprocess.Popen(
        [_spark_class(), cls, *args],
        stdout=log, stderr=subprocess.STDOUT, env=_env(),
        start_new_session=True,
    )
    return p.pid


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        s.settimeout(0.5)
        return s.connect_ex((MASTER_HOST, port)) == 0


def _master_json() -> dict:
    with urllib.request.urlopen(
        f"http://{MASTER_HOST}:{MASTER_UI_PORT}/json/", timeout=2
    ) as r:
        return json.load(r)


def start(workers: int, cores: int, mem: str) -> None:
    if os.path.exists(PID_FILE):
        print(f"pid file {PID_FILE} exists — run stop first")
        sys.exit(1)
    pids = {
        "master": _launch(
            "master", "org.apache.spark.deploy.master.Master",
            "--host", MASTER_HOST, "--port", str(MASTER_PORT),
            "--webui-port", str(MASTER_UI_PORT),
        )
    }
    deadline = time.time() + 60
    while not _port_open(MASTER_PORT):
        if time.time() > deadline:
            print("master did not come up; see", LOG_DIR)
            sys.exit(1)
        time.sleep(0.5)
    for i in range(workers):
        pids[f"worker{i}"] = _launch(
            f"worker{i}", "org.apache.spark.deploy.worker.Worker",
            f"spark://{MASTER_HOST}:{MASTER_PORT}",
            "--cores", str(cores), "--memory", mem,
            "--webui-port", str(MASTER_UI_PORT + 1 + i),
        )
    deadline = time.time() + 90
    while True:
        try:
            alive = [
                w for w in _master_json().get("workers", [])
                if w.get("state") == "ALIVE"
            ]
            if len(alive) >= workers:
                break
        except Exception:
            pass
        if time.time() > deadline:
            print("workers did not register; see", LOG_DIR)
            stop_pids(pids)
            sys.exit(1)
        time.sleep(1)
    with open(PID_FILE, "w") as f:
        json.dump(pids, f)
    print(
        f"standalone cluster up: spark://{MASTER_HOST}:{MASTER_PORT} "
        f"({workers} worker daemons x {cores} cores x {mem}); pids {pids}"
    )


def stop_pids(pids: dict) -> None:
    for name, pid in sorted(pids.items(), reverse=True):  # workers first
        try:
            os.killpg(os.getpgid(pid), signal.SIGTERM)
        except OSError:
            try:
                os.kill(pid, signal.SIGTERM)
            except OSError:
                pass
    time.sleep(2)
    for pid in pids.values():
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass


def stop() -> None:
    if not os.path.exists(PID_FILE):
        print("no pid file; nothing to stop")
        return
    with open(PID_FILE) as f:
        pids = json.load(f)
    stop_pids(pids)
    os.remove(PID_FILE)
    print("stopped", pids)


def status() -> None:
    try:
        j = _master_json()
    except Exception as e:
        print("master not reachable:", e)
        return
    print(json.dumps(
        {
            "url": j.get("url"),
            "workers": [
                {k: w.get(k) for k in ("id", "state", "cores", "memory")}
                for w in j.get("workers", [])
            ],
            "status": j.get("status"),
        },
        indent=2,
    ))


def sweep(workers: int, cores: int, mem: str, extra: list[str]) -> int:
    owned = not os.path.exists(PID_FILE)
    if owned:
        start(workers, cores, mem)
    try:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cmd = [
            sys.executable, os.path.join(repo, "tools", "selfcheck.py"),
            "--master", f"spark://{MASTER_HOST}:{MASTER_PORT}",
            # one executor per worker daemon: grant-sized
            "--conf", f"spark.executor.cores={cores}",
            "--conf", "spark.executor.memory=4g",
            "--conf", "spark.cores.max=" + str(workers * cores),
            *extra,
        ]
        print("+", " ".join(cmd))
        return subprocess.call(cmd)
    finally:
        if owned:
            stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["start", "stop", "status", "sweep"])
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--mem", default="6g")
    # everything after a literal `--` goes to selfcheck.py verbatim
    argv = sys.argv[1:]
    extra: list[str] = []
    if "--" in argv:
        cut = argv.index("--")
        argv, extra = argv[:cut], argv[cut + 1:]
    args = ap.parse_args(argv)
    args.extra = extra
    if args.cmd == "start":
        start(args.workers, args.cores, args.mem)
    elif args.cmd == "stop":
        stop()
    elif args.cmd == "status":
        status()
    else:
        sys.exit(sweep(args.workers, args.cores, args.mem, args.extra))


if __name__ == "__main__":
    main()

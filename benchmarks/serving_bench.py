"""Concurrent REST serving benchmark: closed-loop clients against the
full server stack (HTTP -> DBServer -> QueryBatcher -> device kernels).

Mirrors the reference's HTTP concurrency test (reference
test/concurrency/test.py: threads x queries via pyepsilla) at production
shape: starts the server as a subprocess (device loop on its main
thread), ingests a clustered table, rebuilds, then runs N closed-loop
client threads issuing top-10 queries and reports QPS + latency
percentiles as one JSON line.

Usage: python benchmarks/serving_bench.py [port] [n_rows] [clients]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def post(port, path, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read().decode())


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 18911
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_clients = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    per_client = 40
    dim, k = 128, 10

    tmp = tempfile.mkdtemp(prefix="servbench")
    with open(tmp + "/server.log", "wb") as logf:
        proc = subprocess.Popen(
            [sys.executable, "-u", "-m", "vectordb_tpu", "-p", str(port)],
            cwd=REPO, stdout=logf, stderr=logf,
            start_new_session=True)
    try:
        for _ in range(120):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/state", timeout=2)
                break
            except Exception:
                time.sleep(1)
        else:
            raise RuntimeError("server did not come up")

        # vectorScale: the reference's default table capacity is 150k
        # (web_controller.hpp:38) and inserts past it are a hard error by
        # design — size the table to the workload like a client would.
        post(port, "/api/load", {"name": "sb", "path": tmp + "/sb",
                                 "vectorScale": max(n + 1024, 150_000)})
        post(port, "/api/sb/schema/tables", {
            "name": "t",
            "fields": [
                {"name": "ID", "dataType": "INT", "primaryKey": True},
                {"name": "V", "dataType": "VECTOR_FLOAT",
                 "dimensions": dim, "metricType": "EUCLIDEAN"}],
        })
        win = os.environ.get("SERV_BATCH_WINDOW_MS")
        if win:
            post(port, "/api/config", {"QueryBatchWindowMs": float(win)})
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(3000, dim)) * 2
        x = (centers[rng.integers(0, 3000, n)]
             + rng.normal(size=(n, dim))).astype(np.float32)
        t0 = time.time()
        bs = 10_000
        for s in range(0, n, bs):
            recs = [{"ID": i, "V": x[i].tolist()} for i in range(s, min(s + bs, n))]
            post(port, "/api/sb/data/insert", {"table": "t", "data": recs})
        ingest_s = time.time() - t0
        print(f"ingest {n}: {ingest_s:.1f}s "
              f"({n/ingest_s:.0f} rows/s via JSON REST)", file=sys.stderr)
        t0 = time.time()
        # Cold-cache builds compile dozens of kernels through the remote
        # compiler; give the one-time rebuild headroom beyond the default.
        post(port, "/api/rebuild", {}, timeout=1800)
        rebuild_s = time.time() - t0
        print(f"rebuild: {rebuild_s:.1f}s", file=sys.stderr)

        queries = (x[rng.integers(0, n, 4096)]
                   + 0.1 * rng.normal(size=(4096, dim))).astype(np.float32)

        # Pre-serialize query payloads once (client-side JSON encode of
        # 128 floats is pure overhead on this shared single core).
        payloads = [json.dumps({
            "table": "t", "queryField": "V",
            "queryVector": queries[i].tolist(),
            "limit": k, "withDistance": True}).encode()
            for i in range(512)]
        # ID-only projection phase: the reference's `response` field
        # selector (web_controller.hpp query payload). All-fields
        # responses carry the 128-d vector (~0.3 ms server encode +
        # ~0.6 ms CLIENT-side parse per request on this single shared
        # core); ID-only is what latency-sensitive clients request.
        payloads_id = [json.dumps({
            "table": "t", "queryField": "V",
            "queryVector": queries[i].tolist(),
            "limit": k, "withDistance": True,
            "response": ["ID"]}).encode()
            for i in range(512)]

        # Raw-socket clients: the wave measures SERVER capacity, but the
        # closed-loop clients share this host's ONLY core — with
        # http.client + json.loads they burned 0.77 ms/req (34% of the
        # core, r5 measurement), i.e. the harness was throttling the
        # thing it measured. Requests are pre-framed bytes; responses
        # are drained by Content-Length with zero parsing in the timed
        # loop; every 16th body is retained and fully validated AFTER
        # the wave.
        import socket

        def frame(pl):
            return (b"POST /api/sb/data/query HTTP/1.1\r\n"
                    b"Host: 127.0.0.1\r\n"
                    b"Content-Type: application/json\r\n"
                    b"Content-Length: " + str(len(pl)).encode() +
                    b"\r\n\r\n" + pl)

        frames = [frame(p) for p in payloads]
        frames_id = [frame(p) for p in payloads_id]

        def read_response(sock, buf):
            while b"\r\n\r\n" not in buf:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("server closed")
                buf += chunk
            head, _, rest = buf.partition(b"\r\n\r\n")
            cl = 0
            for line in head.split(b"\r\n"):
                if line[:15].lower() == b"content-length:":
                    cl = int(line[15:])
                    break
            while len(rest) < cl:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("server closed")
                rest += chunk
            return head, rest[:cl], rest[cl:]

        def warm_wave(fr):
            s = socket.create_connection(("127.0.0.1", port), timeout=300)
            buf = b""
            for qi in range(4):
                s.sendall(fr[qi])
                head, body, buf = read_response(s, buf)
                assert json.loads(body).get("statusCode") == 200, body[:200]
            s.close()

        warm_wave(frames)

        def run_wave(fr):
            lat = []
            lat_lock = threading.Lock()
            errors = []
            sampled = []

            def client(cid):
                mine = []
                keep = []
                try:
                    s = socket.create_connection(("127.0.0.1", port),
                                                 timeout=300)
                    buf = b""
                    for j in range(per_client):
                        t1 = time.perf_counter()
                        s.sendall(fr[(cid * per_client + j) % 512])
                        head, body, buf = read_response(s, buf)
                        mine.append(time.perf_counter() - t1)
                        if not head.startswith(b"HTTP/1.1 200"):
                            errors.append(head[:60])
                        if j % 16 == 0:
                            keep.append(body)
                    s.close()
                except Exception as e:
                    errors.append(repr(e))
                with lat_lock:
                    lat.extend(mine)
                    sampled.extend(keep)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(n_clients)]
            t0 = time.time()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.time() - t0
            # Post-wave validation (untimed): every retained body must be
            # a well-formed 200 with k results.
            for body in sampled:
                r = json.loads(body)
                if (r.get("statusCode") != 200
                        or len(r.get("result", [])) != k):
                    errors.append(("bad-body", str(body[:120])))
            total = n_clients * per_client
            qps = (total - len(errors)) / wall
            return qps, np.asarray(lat) * 1e3, errors

        def cpu_seconds():
            """(server, this-process) CPU seconds — saturation accounting:
            this host has ONE core, shared by the server AND the closed-
            loop clients; qps * (server+client CPU per request) == 1 core
            proves the measurement is CPU-floor-bound, not engine-bound."""
            import resource
            with open(f"/proc/{proc.pid}/stat") as f:
                parts = f.read().split()
            tick = os.sysconf("SC_CLK_TCK")
            srv = (int(parts[13]) + int(parts[14])) / tick
            ru = resource.getrusage(resource.RUSAGE_SELF)
            return srv, ru.ru_utime + ru.ru_stime

        srv0, cli0 = cpu_seconds()
        t_wave0 = time.time()
        qps, lat_ms, errors = run_wave(frames)
        qps_id, lat_id_ms, errors_id = run_wave(frames_id)
        wave_wall = time.time() - t_wave0
        srv1, cli1 = cpu_seconds()
        srv_cpu, cli_cpu = srv1 - srv0, cli1 - cli0
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/api/metrics",
                    timeout=30) as r:
                print("metrics:", r.read().decode()[:600], file=sys.stderr)
        except Exception:
            pass
        out = {
            "metric": f"rest_serving_qps_{n_clients}clients_{n//1000}k",
            "value": round(qps, 1),
            "unit": "qps",
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            "errors": len(errors),
            "qps_id_only": round(qps_id, 1),
            "p50_id_only_ms": round(float(np.percentile(lat_id_ms, 50)), 1),
            "errors_id_only": len(errors_id),
            "ingest_rows_per_s": round(n / ingest_s, 1),
            "rebuild_seconds": round(rebuild_s, 1),
            # Single-core saturation accounting: on this 1-core host the
            # server and the 256 closed-loop clients share the only core;
            # cpu_utilization ~ 1.0 proves the QPS number is the Python
            # CPU floor (HTTP+JSON on both sides), not an engine ceiling.
            "server_cpu_s": round(srv_cpu, 1),
            "client_cpu_s": round(cli_cpu, 1),
            "cpu_utilization": round((srv_cpu + cli_cpu) / wave_wall, 3),
        }
        print(json.dumps(out))
        for e in (errors[:2], errors_id[:2]):
            if e:
                print("sample errors:", e, file=sys.stderr)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()

"""Server entrypoint: `python -m vectordb_tpu [-p PORT] [-r] [-l LEADER] [-e URL]`.

Mirrors the reference CLI (/root/reference/engine/cmd/server/main.cpp:33-94):
  -p/--port               HTTP port (default 8888)
  -r/--rebuild true|false background rebuild every 60 s (default true)
  -l/--leader true|false  leader node (default true)
  -e/--embedding_baseurl  embedding sidecar base URL
                          (default http://localhost:8889)
"""
from __future__ import annotations

import argparse
import sys


def str2bool(v: str) -> bool:
    return str(v).lower() not in ("false", "0", "no")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="vectordb_tpu")
    parser.add_argument("-p", "--port", type=int, default=8888)
    parser.add_argument("-r", "--rebuild", type=str2bool, default=True,
                        help="enable periodic background rebuild")
    parser.add_argument("-l", "--leader", type=str2bool, default=True,
                        help="run as the leader node")
    parser.add_argument("-e", "--embedding_baseurl", type=str,
                        default="http://localhost:8889")
    args = parser.parse_args(argv)

    import faulthandler
    import signal

    # SIGUSR1 dumps all thread stacks to stderr (live-debug aid).
    faulthandler.register(signal.SIGUSR1, all_threads=True)

    from .db_server import DBServer
    from .logger import logger
    from .rest import create_server
    from .services import EmbeddingService

    # Initialize the JAX backend AND run the process's first compile on the
    # MAIN thread before any request-handler thread touches the device —
    # some PJRT backends (e.g. tunneled TPU) deadlock when the first
    # compilation of a process happens off the main thread.
    import jax
    import jax.numpy as jnp

    logger.info(f"JAX devices: {jax.devices()}")
    jax.jit(lambda a: a + 1)(jnp.zeros((8, 128))).block_until_ready()
    logger.info("JAX compile path primed")

    # Serving mode pre-compiles EVERY query-batch bucket after load/
    # rebuild (table._warmup): a client flood right after a rebuild must
    # never stall behind a big-bucket XLA compile (measured 19.2 s p-max
    # in the serving bench). Library users keep the cheap default; a
    # POST /api/config can still lower it live.
    from .config import global_config
    global_config.warmup_buckets = 2048

    db = DBServer()
    db.inject_embedding_service(EmbeddingService(args.embedding_baseurl))
    db.set_leader(args.leader)
    if args.rebuild:
        db.start_rebuild()

    httpd = create_server(args.port, db)
    logger.info(f"vectordb-tpu server listening on port {args.port} "
                f"(leader={args.leader}, rebuild={args.rebuild})")
    # HTTP serves from worker threads; the MAIN thread runs the device
    # executor loop (PJRT compiles are fastest on the main thread, and
    # kernel execution is serialized like the reference's executor pool).
    import threading

    http_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    http_thread.start()
    try:
        db.device_executor.run_loop()
    except KeyboardInterrupt:
        pass
    finally:
        db.device_executor.stop()
        httpd.shutdown()
        db.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

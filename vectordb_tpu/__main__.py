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

    from .db_server import DBServer
    from .logger import logger
    from .rest import create_server
    from .services import EmbeddingService

    db = DBServer()
    db.inject_embedding_service(EmbeddingService(args.embedding_baseurl))
    db.set_leader(args.leader)
    if args.rebuild:
        db.start_rebuild()

    httpd = create_server(args.port, db)
    logger.info(f"vectordb-tpu server listening on port {args.port} "
                f"(leader={args.leader}, rebuild={args.rebuild})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        db.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Status / error codes.

Mirrors the reference engine's error-code bases and codes
(/root/reference/engine/utils/error.hpp:11-41 and utils/status.hpp) so that
clients of the reference engine see identical numeric codes from this
framework.
"""
from __future__ import annotations

from dataclasses import dataclass

INFRA_SUCCESS = 0
INFRA_ERROR_CODE_BASE = 40000
DB_SUCCESS = 0
DB_ERROR_CODE_BASE = 50000
USER_ERROR = 30000

INFRA_UNEXPECTED_ERROR = INFRA_ERROR_CODE_BASE + 1
INFRA_UNSUPPORTED_ERROR = INFRA_ERROR_CODE_BASE + 2

DB_UNEXPECTED_ERROR = DB_ERROR_CODE_BASE + 1
DB_UNSUPPORTED_ERROR = DB_ERROR_CODE_BASE + 2
DB_NOT_FOUND = DB_ERROR_CODE_BASE + 3
DB_ALREADY_EXIST = DB_ERROR_CODE_BASE + 31
TABLE_ALREADY_EXISTS = DB_ERROR_CODE_BASE + 4
TABLE_NOT_FOUND = DB_ERROR_CODE_BASE + 5
INVALID_RECORD = DB_ERROR_CODE_BASE + 6
RECORD_NOT_FOUND = DB_ERROR_CODE_BASE + 7
INVALID_EXPR = DB_ERROR_CODE_BASE + 8
NOT_IMPLEMENTED_ERROR = DB_ERROR_CODE_BASE + 9
INVALID_NAME = DB_ERROR_CODE_BASE + 101
INVALID_PAYLOAD = DB_ERROR_CODE_BASE + 400


@dataclass(frozen=True)
class Status:
    """Result status carrying a code and message (reference utils/status.hpp)."""

    code: int = 0
    message: str = ""

    @staticmethod
    def OK() -> "Status":
        return Status(0, "")

    def ok(self) -> bool:
        return self.code == 0

    def __bool__(self) -> bool:  # truthy when OK, matching `if status.ok()` idiom
        return self.ok()


class VectorDBError(Exception):
    """Exception carrying a Status; raised by the object API, converted to
    (code, message) by the epsilla-compatible module API."""

    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code
        self.message = message

    @property
    def status(self) -> Status:
        return Status(self.code, self.message)


def raise_status(status: Status):
    if not status.ok():
        raise VectorDBError(status.code, status.message)

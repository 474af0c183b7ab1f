"""Error type for all fatal framework paths.

Mirrors the reference's single funnel exception (ref:
utilities/RankLibError.java:~10 — the codelibs fork routes every fatal path
through RankLibError instead of System.exit).
"""


class RankLibError(RuntimeError):
    """Raised for any user-facing fatal error (bad flags, bad data, bad model)."""

    @staticmethod
    def create(msg, cause=None):
        err = RankLibError(msg)
        if cause is not None:
            err.__cause__ = cause
        return err

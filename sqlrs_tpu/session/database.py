"""Placeholder; real session layer lands with the executor."""


class Database:
    pass

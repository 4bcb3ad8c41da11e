from sqlrs_tpu.parser.parser import parse, parse_one
from sqlrs_tpu.parser import ast

__all__ = ["parse", "parse_one", "ast"]

from .gbnf import Grammar, GrammarState, parse_gbnf
from .json_schema import json_schema_to_gbnf

__all__ = ["Grammar", "GrammarState", "parse_gbnf", "json_schema_to_gbnf"]

"""Pure-Python per-document extraction kernel (no Spark imports).

Pipeline: source text -> lexer -> parser (syntax tree) -> PE builder
(program-element tree with reference-faithful text rendering) -> def/use
analysis -> CFG -> PDG -> (nodes, triples) rows.
"""

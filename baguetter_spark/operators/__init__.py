"""Relational + kernel operators: index build, search, fusion, set ops, dedup…"""

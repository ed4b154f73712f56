"""Parallelism: device mesh, GSPMD sharding rules, sequence parallelism."""

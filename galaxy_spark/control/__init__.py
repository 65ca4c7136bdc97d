"""Control plane: task lifecycle + observability (T1/T2/M1)."""

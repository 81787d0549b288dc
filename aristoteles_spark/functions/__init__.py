"""Pure Column->Column expression libraries (no UDFs in the hot path)."""

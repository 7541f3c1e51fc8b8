"""Query plans: the reference's three analytical queries plus headline
analytics queries over the testdata star schema."""

"""Pure + vectorized building blocks shared by the Spark UDFs and the oracle."""

"""Sources & sinks: the heparchy-layout Parquet store and the HDF5 bridge."""

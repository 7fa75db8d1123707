"""Sources: synthetic web-page corpus, polygon layer catalogs, testdata
loaders, partitioned tile sinks."""

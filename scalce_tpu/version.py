__version__ = "0.1.0"

# On-disk container format version. Bump on any incompatible layout change.
CONTAINER_VERSION = 1

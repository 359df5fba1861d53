"""Pure-Python Cassandra SSTable readers (Data.db / Index.db /
CompressionInfo.db), format versions ic (1.2.x), jb (2.0.x), la (2.2.x).

Reference behavior studied at
/root/reference/aegisthus-hadoop/src/main/java/com/netflix/aegisthus/io/sstable/
(decode is delegated there to Cassandra 2.0.10's OnDiskAtom serializer; here
it is re-implemented from the public on-disk format).
"""

from .descriptor import Descriptor, parse_filename  # noqa: F401
from .decoder import scan_data_file, scan_file  # noqa: F401
from .index import scan_index_offsets  # noqa: F401
from .compression import CompressionInfo, open_compressed  # noqa: F401
from .writer import serialize_row, sstable_filename, write_sstable  # noqa: F401

from callysto_spark.streaming.state import CTable, TableState, bind_table_agent
from callysto_spark.streaming.windows import tumbling, sliding, session

__all__ = ["CTable", "TableState", "bind_table_agent", "tumbling", "sliding", "session"]

"""kalytical-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of westernspion/kalytical (reference studied at
/root/reference; see SURVEY.md for the operator inventory and file:line
citations), extended with LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  session     - SparkSession factory (AQE on, UTC, arrow)
  catalog     - load driver testdata parquet + register derived domain views
  domain      - dialect-shared SQL deriving kalytical-domain fixture tables
  operators/  - the SURVEY.md section-2 operator inventory as DataFrame fns
  streaming/  - Structured Streaming control loop (incubation state machine)
  registry    - name -> (query fn, oracle sql) used by __spark_entry__.py
"""

__version__ = "0.1.0"

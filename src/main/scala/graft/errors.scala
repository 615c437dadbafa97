package graft

/** Engine error taxonomy — names mirror the reference's exception set
  * (api/WorkersException.java:3-18 and the impl/errors package): user-facing
  * failures keep the vocabulary the reference's operators throw, layered
  * over Spark's own AnalysisException/StreamingQueryException.
  */
class GraftException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Out-of-range or invalid subpartition id
  * (impl/errors/BadSubpartitionException). */
class BadSubpartitionException(msg: String) extends GraftException(msg)

/** Offset bookkeeping violation (impl/errors/BadOffsetException). */
class BadOffsetException(msg: String) extends GraftException(msg)

/** Record processing failed under at_least_once
  * (impl/errors/ProcessingFailureException). */
class ProcessingFailureException(msg: String, cause: Throwable)
  extends GraftException(msg, cause)

/** Progress stalled past the processing timeout
  * (impl/errors/ProcessingTimeoutException). */
class ProcessingTimeoutException(msg: String) extends GraftException(msg)

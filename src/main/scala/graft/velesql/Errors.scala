package graft.velesql

/** Error taxonomy (SURVEY.md §2.13 — reference velesql/error.rs and
  * docs/VELESQL_SPEC.md:912-922: SyntaxError / SemanticError / NotFound /
  * TypeMismatch / Timeout). */
sealed abstract class VelesError(message: String) extends RuntimeException(message)

final class SyntaxError(message: String) extends VelesError(message)
final class SemanticError(message: String) extends VelesError(message)
final class NotFoundError(message: String) extends VelesError(message)
final class TypeMismatchError(message: String) extends VelesError(message)
final class TimeoutError(message: String) extends VelesError(message)
final class CostLimitError(message: String) extends VelesError(message)
